"""Streaming Pallas SSD/SAD cost kernel vs the XLA oracle (interpret mode).

The XLA separable-box formulation (ops/cost.py) is the semantic oracle
(itself pinned against the NumPy window oracle in tests/oracles.py).  The
streaming kernel must match it:
  * bit-exactly on the integer chain (uint8/int16 -> int32 cost: integer
    addition is associative, so summation order is invisible);
  * within last-ulp-scale relative error on float (different summation
    order over <= 4k^2 non-negative f32 terms + the in-block running
    vertical sum, re-anchored every R rows);
  * with identical +inf / int-max placement (the d > col validity rule,
    src/ssd.cu:58-60).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.ops.cost import sad_cost_volume, ssd_cost_volume
from stereomatch_tpu.ops.ssd_pallas import (diff_cost_volume_pallas,
                                            sad_cost_volume_pallas,
                                            ssd_cost_volume_pallas,
                                            ssd_pallas_preferred,
                                            ssd_pallas_supported)

REL_TOL = 2e-6   # ~20 f32 ulps of the value itself ...
ABS_TOL = 2e-6   # ... or of the running-sum magnitude (small outputs can
                 # carry a few ulps of the larger intermediate window sums)


def _compare_float(ref, out):
    ref, out = np.asarray(ref), np.asarray(out)
    np.testing.assert_array_equal(ref == np.inf, out == np.inf)
    fin = ref != np.inf
    err = np.abs(ref[fin] - out[fin])
    bound = ABS_TOL + REL_TOL * np.abs(ref[fin])
    assert (err <= bound).all(), (err - bound).max()


# Geometry sweep: tall/wide/tiny, k from degenerate 1 to the default 7,
# heights that are prime (rows_per_step = 1), divisible by 8, and < k.
SHAPES = [
    (16, 24, 8, 3),
    (46, 56, 16, 7),     # teddy-like aspect at 1/8 scale
    (9, 33, 8, 1),
    (5, 12, 16, 7),      # H < k: every window clips
    (1, 10, 4, 2),       # single row
    (24, 32, 32, 5),
    (13, 17, 8, 4),      # prime H and W
    (40, 30, 8, 7),      # W < 2k at the left-validity boundary
]


@pytest.mark.parametrize("shape", SHAPES, ids=lambda s: f"{s[0]}x{s[1]}d{s[2]}k{s[3]}")
def test_ssd_float_matches_xla(shape):
    h, w, d, k = shape
    rng = np.random.default_rng(h * 100 + w)
    left = rng.random((h, w), np.float32)
    right = rng.random((h, w), np.float32)
    ref = ssd_cost_volume(left, right, max_disparity=d, kernel_size=k)
    out = ssd_cost_volume_pallas(left, right, max_disparity=d,
                                 kernel_size=k, interpret=True)
    _compare_float(ref, out)


@pytest.mark.parametrize("shape", SHAPES[:4], ids=lambda s: f"{s[0]}x{s[1]}d{s[2]}k{s[3]}")
def test_sad_float_matches_xla(shape):
    h, w, d, k = shape
    rng = np.random.default_rng(h + w)
    left = rng.random((h, w), np.float32)
    right = rng.random((h, w), np.float32)
    ref = sad_cost_volume(left, right, max_disparity=d, kernel_size=k)
    out = sad_cost_volume_pallas(left, right, max_disparity=d,
                                 kernel_size=k, interpret=True)
    _compare_float(ref, out)


@pytest.mark.parametrize("in_dtype", [np.uint8, np.int16])
@pytest.mark.parametrize("absolute", [False, True], ids=["ssd", "sad"])
def test_integer_chain_bit_exact(in_dtype, absolute):
    """uint8/int16 images -> int32 cost: associative sums, exact equality
    (the reference's type_dispatch.hpp matrix, src/type_dispatch.hpp:38-110)."""
    rng = np.random.default_rng(3)
    h, w, d, k = 21, 33, 16, 5
    lo, hi = (0, 255) if in_dtype == np.uint8 else (-300, 300)
    left = rng.integers(lo, hi, (h, w)).astype(in_dtype)
    right = rng.integers(lo, hi, (h, w)).astype(in_dtype)
    fn = sad_cost_volume if absolute else ssd_cost_volume
    ref = fn(left, right, max_disparity=d, kernel_size=k,
             cost_dtype=jnp.int32)
    out = diff_cost_volume_pallas(left, right, max_disparity=d,
                                  kernel_size=k, cost_dtype=jnp.int32,
                                  absolute=absolute, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_bf16_storage():
    """bf16 output: f32 compute, narrowed on store — within one bf16 ulp
    of the XLA result cast to bf16 (last-ulp f32 differences can cross a
    rounding boundary)."""
    rng = np.random.default_rng(7)
    h, w, d, k = 32, 48, 16, 7
    left = rng.random((h, w), np.float32)
    right = rng.random((h, w), np.float32)
    ref = np.asarray(ssd_cost_volume(left, right, max_disparity=d,
                                     kernel_size=k,
                                     cost_dtype=jnp.bfloat16
                                     ).astype(jnp.float32))
    out = np.asarray(ssd_cost_volume_pallas(left, right, max_disparity=d,
                                            kernel_size=k,
                                            cost_dtype=jnp.bfloat16,
                                            interpret=True
                                            ).astype(jnp.float32))
    np.testing.assert_array_equal(ref == np.inf, out == np.inf)
    fin = ref != np.inf
    rel = np.abs(ref[fin] - out[fin]) / np.maximum(np.abs(ref[fin]), 1e-30)
    assert rel.max() <= 1 / 128, rel.max()   # one bf16 ulp


def test_validity_identical_to_xla_on_integer_ramp():
    """Distinct-value integer volume: the +inf/int-max cells and every
    finite cell agree exactly, so downstream argmin tie-breaks cannot
    diverge between backends (the reference's distinct-value test design,
    tests/test_winners_take_all.py:31-33)."""
    h, w, d, k = 12, 40, 8, 3
    left = (np.arange(h * w).reshape(h, w) % 251).astype(np.uint8)
    right = ((np.arange(h * w).reshape(h, w) * 7) % 251).astype(np.uint8)
    ref = ssd_cost_volume(left, right, max_disparity=d, kernel_size=k,
                          cost_dtype=jnp.int32)
    out = ssd_cost_volume_pallas(left, right, max_disparity=d,
                                 kernel_size=k, cost_dtype=jnp.int32,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_vmem_gate():
    """The support predicate admits the bench geometries and rejects HD
    f32 (whose 2k x [256, 1294+] ring cannot fit the 12 MB budget)."""
    assert ssd_pallas_supported(375, 450, 128, 7)       # teddy
    assert ssd_pallas_supported(256, 512, 32, 7)        # reference cost geom
    assert not ssd_pallas_supported(1024, 1280, 256, 7)  # HD: XLA fallback


def test_preferred_gate_matches_measurements():
    """Dispatch prefers the kernel exactly where the chip measurements
    say it wins: lane-aligned W and D <= 64."""
    assert ssd_pallas_preferred(256, 512, 32, 7)        # 3.3x win
    assert ssd_pallas_preferred(375, 384, 64, 7)        # win
    assert not ssd_pallas_preferred(375, 448, 64, 7)    # unaligned W: loss
    assert not ssd_pallas_preferred(375, 450, 128, 7)   # D=128: loss
    assert not ssd_pallas_preferred(1024, 1280, 64, 7)  # over VMEM budget


def test_api_dispatch_backends_agree():
    """cost.SSD(backend=...) routes to the streaming kernel without
    changing results beyond the pinned float bound."""
    from stereomatch_tpu.cost import SSD

    rng = np.random.default_rng(11)
    left = rng.random((24, 40), np.float32)
    right = rng.random((24, 40), np.float32)
    ref = SSD(16, backend="xla")(left, right)
    # interpret-mode pallas == on-CPU "pallas" is exercised via the op
    # directly (the class's auto gate resolves to xla on CPU).
    out = ssd_cost_volume_pallas(left, right, max_disparity=16,
                                 kernel_size=7, interpret=True)
    _compare_float(ref, out)


def test_explicit_pallas_backend_takes_kernel_through_class():
    """Explicit backend="pallas" forces the streaming kernel through
    SSD/SAD.__call__ whenever the geometry fits VMEM — even off-TPU,
    where the dispatch runs it in interpret mode.  Pins the class-level
    routing (previously only validated by the hardware probe)."""
    import stereomatch_tpu.cost as cost_mod
    from stereomatch_tpu.cost import SAD, SSD

    rng = np.random.default_rng(12)
    left = rng.random((24, 40), np.float32)
    right = rng.random((24, 40), np.float32)

    calls = []
    real = cost_mod.diff_cost_volume_pallas

    def spy(*args, **kwargs):
        calls.append(kwargs.get("absolute"))
        return real(*args, **kwargs)

    cost_mod.diff_cost_volume_pallas = spy
    try:
        # 24x40 fails the *preferred* gate (W % 128 != 0) but fits VMEM:
        # explicit "pallas" must still take the kernel.
        out_ssd = SSD(16, backend="pallas")(left, right)
        out_sad = SAD(16, backend="pallas")(left, right)
    finally:
        cost_mod.diff_cost_volume_pallas = real
    assert calls == [False, True]
    _compare_float(SSD(16, backend="xla")(left, right), out_ssd)
    _compare_float(SAD(16, backend="xla")(left, right), out_sad)


def test_auto_gate_uses_preferred_not_supported(monkeypatch):
    """backend="auto" consults ssd_pallas_preferred (the measured-win
    predicate), never the broader supported gate."""
    import stereomatch_tpu.cost as cost_mod
    from stereomatch_tpu.cost import SSD

    rng = np.random.default_rng(13)
    left = rng.random((24, 40), np.float32)
    right = rng.random((24, 40), np.float32)

    ref = SSD(16, backend="xla")(left, right)   # before the patches below
    seen = []
    monkeypatch.setattr(cost_mod, "resolve_backend", lambda b: "pallas")
    monkeypatch.setattr(cost_mod, "ssd_pallas_preferred",
                        lambda *a: seen.append(a) or False)
    calls = []
    monkeypatch.setattr(
        cost_mod, "diff_cost_volume_pallas",
        lambda *a, **k: calls.append(1))
    out = SSD(16, backend="auto")(left, right)      # falls through to XLA
    assert seen == [(24, 40, 16, 7)]
    assert not calls
    _compare_float(ref, out)
