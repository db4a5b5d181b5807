"""Fused wedge-CVF Pallas kernel (ops/cvf_pallas.py).

Oracle chain: the XLA wedge path (ops/cvf.py::_filter_body_wedge) is
the trusted form (itself pinned to the masked oracle in test_cvf.py);
the fused kernel must match it in interpret mode across geometries,
radii, offsets and storage dtypes — same masked means, different
summation association, so allclose rather than bit-equal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.ops.cvf import guided_filter_aggregate
from stereomatch_tpu.ops.cvf_pallas import (fused_wedge_fits,
                                            guided_filter_wedge_pallas)


def _wedge_volume(rng, h, w, d, off=0):
    vol = rng.random((h, w, d), np.float32)
    x, dd = np.meshgrid(np.arange(w), np.arange(d), indexing="ij")
    vol[:, x < dd + off] = np.inf
    return vol


@pytest.mark.parametrize("h,w,d,r,off", [
    (20, 30, 12, 3, 0),
    (17, 25, 8, 2, 3),      # nonzero disparity offset
    (33, 41, 16, 8, 0),     # radius > image-fraction
    (12, 40, 16, 1, 0),     # minimum radius
    (24, 26, 5, 4, 0),      # ragged width / non-pow2 D
])
def test_matches_xla_wedge_path(h, w, d, r, off):
    rng = np.random.default_rng(h + w)
    vol = _wedge_volume(rng, h, w, d, off)
    g = rng.random((h, w), np.float32)
    ref = np.asarray(guided_filter_aggregate(vol, g, radius=r,
                                             wedge_offset=off))
    got = np.asarray(guided_filter_wedge_pallas(vol, g, radius=r,
                                                wedge_offset=off,
                                                interpret=True))
    assert np.array_equal(np.isinf(got), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-5)


def test_bf16_storage_roundtrip():
    rng = np.random.default_rng(4)
    vol = _wedge_volume(rng, 18, 28, 8)
    g = rng.random((18, 28), np.float32)
    out16 = guided_filter_wedge_pallas(jnp.asarray(vol, jnp.bfloat16), g,
                                       radius=2, interpret=True)
    assert out16.dtype == jnp.bfloat16
    out32 = np.asarray(guided_filter_wedge_pallas(vol, g, radius=2,
                                                  interpret=True))
    m = np.isfinite(out32)
    np.testing.assert_allclose(np.asarray(out16, np.float32)[m], out32[m],
                               rtol=0.02, atol=0.01)


def test_volume_ring_and_refs_layouts_agree():
    """The two volume-tap layouts (VMEM ring vs mid/lag HBM refs) run
    identical arithmetic — bit-equal outputs."""
    rng = np.random.default_rng(17)
    vol = _wedge_volume(rng, 26, 34, 8)
    g = rng.random((26, 34), np.float32)
    ring = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=3, interpret=True, volume_ring=True))
    refs = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=3, interpret=True, volume_ring=False))
    np.testing.assert_array_equal(ring, refs)
    # Stride-k per-row refs: k > 1 works in the refs layout too.
    refs3 = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=3, interpret=True, volume_ring=False,
        rows_per_step=3))
    np.testing.assert_array_equal(ring, refs3)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_rows_per_step_equivalence(k):
    """Every rows_per_step must produce the SAME result bit-for-bit —
    the unrolled sub-steps run identical arithmetic in identical order,
    only the grid bookkeeping amortizes.  Height chosen indivisible by
    k to exercise the padded-output slice."""
    rng = np.random.default_rng(21)
    h, w, d, r = 27, 31, 8, 4                  # 3r = 12: k in {1,2,4} ok
    vol = _wedge_volume(rng, h, w, d)
    g = rng.random((h, w), np.float32)
    base = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=r, interpret=True, rows_per_step=1))
    got = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=r, interpret=True, rows_per_step=k))
    np.testing.assert_array_equal(got, base)
    with pytest.raises(ValueError, match="rows_per_step"):
        guided_filter_wedge_pallas(vol, g, radius=r, interpret=True,
                                   rows_per_step=5)


def test_vmem_gate_and_radius_validation():
    assert fused_wedge_fits(375, 450, 128, 8)        # teddy: fused
    assert not fused_wedge_fits(1024, 1280, 256, 8)  # HD: XLA fallback
    rng = np.random.default_rng(0)
    vol = _wedge_volume(rng, 8, 12, 4)
    g = rng.random((8, 12), np.float32)
    with pytest.raises(ValueError, match="radius"):
        guided_filter_wedge_pallas(vol, g, radius=0, interpret=True)


def test_wta_agreement_on_distinct_volume():
    """Integer-robust contract: identical WTA picks on a volume whose
    aggregated costs don't near-tie."""
    from stereomatch_tpu.ops.disparity import winner_takes_all
    rng = np.random.default_rng(9)
    vol = _wedge_volume(rng, 30, 44, 16)
    g = rng.random((30, 44), np.float32)
    ref = np.asarray(winner_takes_all(
        guided_filter_aggregate(vol, g, radius=4, wedge_offset=0)))
    got = np.asarray(winner_takes_all(
        guided_filter_wedge_pallas(vol, g, radius=4, interpret=True)))
    assert (got == ref).mean() > 0.995


@pytest.mark.parametrize("h,w,d,r,wc,off", [
    (30, 72, 12, 3, 24, 0),
    (26, 70, 8, 4, 32, 2),     # width not divisible by chunk
    (22, 64, 16, 8, 40, 0),    # radius 8, ragged last chunk
])
def test_chunked_matches_xla_wedge_path(h, w, d, r, wc, off):
    """The W-chunked kernel (HD fallback) must match the XLA wedge path
    like the full-width kernel does — including cross-chunk window
    coupling through the 2r column halos and ragged last chunks."""
    from stereomatch_tpu.ops.cvf_pallas import \
        guided_filter_wedge_chunked_pallas
    rng = np.random.default_rng(h * w)
    vol = _wedge_volume(rng, h, w, d, off)
    g = rng.random((h, w), np.float32)
    ref = np.asarray(guided_filter_aggregate(vol, g, radius=r,
                                             wedge_offset=off))
    got = np.asarray(guided_filter_wedge_chunked_pallas(
        vol, g, radius=r, wedge_offset=off, chunk_width=wc,
        interpret=True))
    assert np.array_equal(np.isinf(got), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-5)


def test_chunk_width_picker():
    from stereomatch_tpu.ops.cvf_pallas import pick_chunk_width
    # HD geometry gets a usable chunk in both dtypes.
    assert pick_chunk_width(1280, 256, 8, 4) >= 64
    assert pick_chunk_width(1280, 256, 8, 2) >= 64
    # Small widths cap at the (padded) full width.
    assert pick_chunk_width(120, 128, 8, 4) == 120


def test_raw_volume_matches_prepadded_refs():
    """The raw-volume refs layout (kernel-side pad/mask/row-gate; no
    XLA volume copy) must equal the pre-padded refs layout bit-for-bit
    — same arithmetic, the masking just moved into VMEM."""
    rng = np.random.default_rng(31)
    vol = _wedge_volume(rng, 28, 36, 8, off=1)
    g = rng.random((28, 36), np.float32)
    pre = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=3, wedge_offset=1, interpret=True,
        volume_ring=False, raw_volume=False))
    raw = np.asarray(guided_filter_wedge_pallas(
        vol, g, radius=3, wedge_offset=1, interpret=True,
        volume_ring=False, raw_volume=True))
    np.testing.assert_array_equal(raw, pre)
    with pytest.raises(ValueError, match="raw_volume"):
        guided_filter_wedge_pallas(vol, g, radius=3, interpret=True,
                                   volume_ring=True, raw_volume=True)
