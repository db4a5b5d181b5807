"""Pallas SGM kernels vs the XLA scan formulation (interpret mode on CPU).

Oracle pattern per the reference's CPU<->GPU equivalence tests
(tests/test_semiglobalmatch.py:39-55): the lax.scan implementation is the
trusted one; the streaming Pallas kernels must agree to float summation
order — same finite/infinite structure, last-ulp value agreement, and
identical WTA disparities.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.cost import ssd_cost_volume
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def volumes():
    left, right, _ = synthetic_stereo_pair(24, 40, D, seed=5)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    return vol, left


def test_pallas_matches_xla_values(volumes):
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate(vol, left))
    out = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize("seed", [5, 11, 23])
def test_pallas_matches_xla_disparities(seed):
    left, right, _ = synthetic_stereo_pair(24, 40, D, seed=seed)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    ref = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    out = np.asarray(winner_takes_all(
        semiglobal_aggregate_pallas(vol, left, interpret=True)))
    np.testing.assert_array_equal(out, ref)


def test_pallas_nondefault_penalties(volumes):
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate(vol, left, penalty1=0.3,
                                          penalty2=0.9))
    out = np.asarray(semiglobal_aggregate_pallas(vol, left, penalty1=0.3,
                                                 penalty2=0.9,
                                                 interpret=True))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6, atol=1e-5)


def _forced_aggregate(vol, left, monkeypatch, **knobs):
    """Run the un-jitted Pallas aggregation with VMEM knobs overridden
    (the jitted wrapper's cache would not see monkeypatched globals)."""
    from stereomatch_tpu.ops import sgm_pallas
    for name, value in knobs.items():
        monkeypatch.setattr(sgm_pallas, name, value)
    return np.asarray(semiglobal_aggregate_pallas.__wrapped__(
        vol, left, interpret=True, horizontal="transposed"))


def test_forced_w_chunks(volumes, monkeypatch):
    """Tiny _WCHUNK_TARGET_BYTES forces the sub-chunked row walk (W=40 ->
    w_chunks=8, the HD adaptation) — must bit-match the default kernel,
    including the wrapped-element/edge-column interplay on diagonals."""
    from stereomatch_tpu.ops import sgm_pallas
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True,
                                                 horizontal="transposed"))
    out = _forced_aggregate(vol, left, monkeypatch,
                            _WCHUNK_TARGET_BYTES=1)
    np.testing.assert_array_equal(out, ref)


def test_forced_no_mask_scratch(volumes, monkeypatch):
    """mask_scratch=False recomputes edge masks per chunk (very large rows
    drop the cache) — bit-identical output."""
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True,
                                                 horizontal="transposed"))
    out = _forced_aggregate(vol, left, monkeypatch,
                            _MASK_CACHE_MAX_BYTES=0)
    np.testing.assert_array_equal(out, ref)


def test_forced_single_family_passes(volumes, monkeypatch):
    """A tiny VMEM budget forces one-family-per-pass grouping (and
    rows_per_step=1).  Summation order changes (per-family accumulation),
    so assert last-ulp agreement + identical disparities instead of bits."""
    from stereomatch_tpu.ops import sgm_pallas
    vol, left = volumes
    row_bytes = vol.shape[1] * vol.shape[2] * 4
    ref = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True,
                                                 horizontal="transposed"))
    out = _forced_aggregate(vol, left, monkeypatch,
                            _VMEM_BUDGET_BYTES=9 * row_bytes,
                            _WGRID_BUDGET_BYTES=0)
    assert len(sgm_pallas._family_groups(vol.shape[1], vol.shape[2])) == 3
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(winner_takes_all(out)),
                                  np.asarray(winner_takes_all(ref)))


@pytest.mark.parametrize("n_chunks", [2, 4])
def test_forced_wgrid_mode(monkeypatch, n_chunks):
    """W-on-grid sweeps (chunked blocks, full-width persistent carry — the
    HD 3-family mode) forced at toy shape: must bit-match the full-width
    kernel, including both cross-chunk boundary-read mechanisms."""
    from stereomatch_tpu.ops import sgm_pallas
    left, right, _ = synthetic_stereo_pair(24, 64, D, seed=9)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    ref = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True,
                                                 horizontal="transposed"))
    row_bytes = sgm_pallas._row_vmem_bytes(64, D)  # padded (8, 128) tiles
    cap = 3 * row_bytes + 10 * (row_bytes // n_chunks)
    out = _forced_aggregate(vol, left, monkeypatch,
                            _VMEM_BUDGET_BYTES=0,
                            _WGRID_BUDGET_BYTES=cap)
    assert sgm_pallas._pick_wgrid_chunks(64, D, 3) == n_chunks
    np.testing.assert_array_equal(out, ref)


def test_forced_all_adaptations_together(volumes, monkeypatch):
    """The extreme fallback: per-family passes + no mask cache + w-chunked
    rows at once (geometries where even the 3-family carry breaks VMEM)."""
    vol, left = volumes
    row_bytes = vol.shape[1] * vol.shape[2] * 4
    ref = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True,
                                                 horizontal="transposed"))
    out = _forced_aggregate(vol, left, monkeypatch,
                            _VMEM_BUDGET_BYTES=9 * row_bytes,
                            _WGRID_BUDGET_BYTES=0,
                            _MASK_CACHE_MAX_BYTES=0,
                            _WCHUNK_TARGET_BYTES=1)
    finite = np.isfinite(ref)
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(winner_takes_all(out)),
                                  np.asarray(winner_takes_all(ref)))


@pytest.mark.parametrize("height", [23, 37])
def test_prime_height_row_padding_exact(height):
    """Prime/odd scan lengths take the zero-row padding path (identity
    rows) and must bit-match the XLA formulation at the value level."""
    from stereomatch_tpu.ops import sgm_pallas
    rng = np.random.default_rng(height)
    width = 40
    vol = rng.random((height, width, D)).astype(np.float32)
    left = rng.random((height, width)).astype(np.float32)
    # The padding predicate must fire for these shapes.
    c, i, h = sgm_pallas._maybe_pad_rows(vol, left, 3)
    assert c.shape[0] % 8 == 0 and h == height
    ref = np.asarray(semiglobal_aggregate(vol, left))
    out = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(winner_takes_all(out)),
                                  np.asarray(winner_takes_all(ref)))


def test_pallas_distinct_value_tiebreak():
    """All-distinct volume (reference test design, test_semiglobalmatch.py:44-47)
    so any reduction-order difference would change the argmin."""
    rng = np.random.default_rng(0)
    height, width = 16, 24
    vol = rng.permutation(height * width * D).reshape(
        height, width, D).astype(np.float32)
    left = rng.random((height, width), np.float32)
    ref = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    out = np.asarray(winner_takes_all(
        semiglobal_aggregate_pallas(vol, left, interpret=True)))
    np.testing.assert_array_equal(out, ref)


# --------------------------------------------------------------------------
# Natural-layout horizontal sweep (round 3): scans along W with a
# VMEM-resident [H, D] carry instead of transposing the volume.
# --------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [
    (24, 64, 16, 3),     # cw=16, exact chunking
    (17, 45, 8, 3),      # ragged W (45 = 5*8 + 5): guarded tail columns
    (48, 58, 32, 5),     # ragged W at a wider D
    (9, 16, 8, 1),       # single chunk
], ids=lambda s: f"{s[0]}x{s[1]}d{s[2]}k{s[3]}")
def test_natural_horizontal_matches_transposed(shape):
    """Same recurrence, same per-column rounding: last-ulp aggregation
    agreement and identical WTA disparities vs the transposed mode (and
    the XLA oracle transitively, via the existing transposed-mode
    tests)."""
    h, w, d, k = shape
    left, right, _ = synthetic_stereo_pair(h, w, d, seed=5)
    vol = ssd_cost_volume(left, right, max_disparity=d, kernel_size=k)
    ref = np.asarray(semiglobal_aggregate_pallas(
        vol, left, interpret=True, horizontal="transposed"))
    out = np.asarray(semiglobal_aggregate_pallas(
        vol, left, interpret=True, horizontal="natural"))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(winner_takes_all(jnp.asarray(out))),
        np.asarray(winner_takes_all(jnp.asarray(ref))))


def test_natural_horizontal_multi_hblock(monkeypatch):
    """A shrunken VMEM budget forces row-blocking of the natural sweep
    (the HD adaptation: grid tiles H too, carry re-seeds per h-block).
    The h-sweep itself is bit-independent across h-blocks, but the same
    budget knob also regroups the ROW passes (per-family fallback), so
    the end-to-end comparison is the standard last-ulp + identical-WTA
    contract rather than bit equality."""
    from stereomatch_tpu.ops import sgm_pallas
    h, w, d, k = 48, 58, 32, 5
    left, right, _ = synthetic_stereo_pair(h, w, d, seed=5)
    vol = ssd_cost_volume(left, right, max_disparity=d, kernel_size=k)
    ref = np.asarray(semiglobal_aggregate_pallas.__wrapped__(
        vol, left, interpret=True, horizontal="natural"))
    assert sgm_pallas._pick_hsweep_chunk(h, w, d)[0] == h
    monkeypatch.setattr(sgm_pallas, "_VMEM_BUDGET_BYTES", 300 * 1024)
    monkeypatch.setattr(sgm_pallas, "_HSWEEP_HC_ALIGN", 8)
    hc, cw = sgm_pallas._pick_hsweep_chunk(h, w, d)
    assert hc < h and h % hc == 0
    out = np.asarray(semiglobal_aggregate_pallas.__wrapped__(
        vol, left, interpret=True, horizontal="natural"))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(winner_takes_all(jnp.asarray(out))),
        np.asarray(winner_takes_all(jnp.asarray(ref))))


def test_natural_horizontal_bf16_dtype():
    """bf16 volumes stream bf16 through the natural sweep too (storage
    dtype preserved; recurrence f32)."""
    left, right, _ = synthetic_stereo_pair(16, 32, 8, seed=3)
    vol = ssd_cost_volume(left, right, max_disparity=8, kernel_size=3,
                          cost_dtype=jnp.bfloat16)
    out = semiglobal_aggregate_pallas(vol, left, interpret=True,
                                      horizontal="natural")
    assert out.dtype == jnp.bfloat16
    ref = semiglobal_aggregate_pallas(vol, left, interpret=True,
                                      horizontal="transposed")
    d16 = np.asarray(winner_takes_all(out))
    d32 = np.asarray(winner_takes_all(ref))
    assert np.mean(d16 != d32) < 0.02


def test_natural_horizontal_unsupported_raises(monkeypatch):
    """Explicit horizontal="natural" on a geometry with no usable
    chunking must raise, never silently fall back."""
    from stereomatch_tpu.ops import sgm_pallas
    left, right, _ = synthetic_stereo_pair(16, 32, 8, seed=3)
    vol = ssd_cost_volume(left, right, max_disparity=8, kernel_size=3)
    monkeypatch.setattr(sgm_pallas, "_VMEM_BUDGET_BYTES", 0)
    with pytest.raises(ValueError, match="natural horizontal"):
        semiglobal_aggregate_pallas.__wrapped__(
            vol, left, interpret=True, horizontal="natural")


def test_unknown_horizontal_mode_raises():
    """A typo ("natual") must raise, not silently take the transposed
    path (ADVICE r3)."""
    left, right, _ = synthetic_stereo_pair(16, 32, 8, seed=3)
    vol = ssd_cost_volume(left, right, max_disparity=8, kernel_size=3)
    with pytest.raises(ValueError, match="unknown horizontal"):
        semiglobal_aggregate_pallas.__wrapped__(
            vol, left, interpret=True, horizontal="natual")
