"""Guided-filter cost-volume aggregation (ops/cvf.py, aggregation.CostFilter).

Oracle pattern as everywhere else in this suite: a direct NumPy
implementation of the documented semantics (symmetric clipped windows,
count-normalized masked means) is the trusted form; the separable XLA
formulation must match it, the masked and assume_finite paths must agree
on finite volumes, and the row-sharded variant must reproduce the
single-chip program bit-for-bit on the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.aggregation import CostFilter
from stereomatch_tpu.cost import SSD, Census
from stereomatch_tpu.disparity_reduce import WinnerTakesAll
from stereomatch_tpu.ops.cvf import guided_filter_aggregate
from stereomatch_tpu.utils import validation

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair
from .oracles import guided_filter_oracle as _gf_oracle

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def masked_volume():
    """Small SSD volume: carries the +inf d > column wedge."""
    rng = np.random.default_rng(11)
    left = rng.random((10, 14), np.float32)
    right = rng.random((10, 14), np.float32)
    vol = np.asarray(SSD(6, kernel_size=2)(left, right))
    return vol, left


def test_matches_oracle_with_inf_wedge(masked_volume):
    vol, left = masked_volume
    out = np.asarray(guided_filter_aggregate(vol, left, radius=2, eps=1e-4))
    ref = _gf_oracle(vol, left, radius=2, eps=1e-4)
    assert np.array_equal(np.isinf(out), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-5)


def test_wedge_path_matches_oracle(masked_volume):
    """The wedge-structured fast path (ops/cvf.py::_filter_body_wedge)
    computes the SAME masked means as the generic path when the volume's
    invalid set is exactly the wedge x < d — different association
    (prefix-plane algebra), so allclose rather than bit-equal."""
    vol, left = masked_volume
    out = np.asarray(guided_filter_aggregate(vol, left, radius=2,
                                             wedge_offset=0))
    ref = _gf_oracle(vol, left, radius=2, eps=1e-4)
    assert np.array_equal(np.isinf(out), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-5)


def test_wedge_path_close_to_masked_path(masked_volume):
    vol, left = masked_volume
    fast = np.asarray(guided_filter_aggregate(vol, left, radius=3,
                                              wedge_offset=0))
    slow = np.asarray(guided_filter_aggregate(vol, left, radius=3))
    assert np.array_equal(np.isinf(fast), np.isinf(slow))
    m = np.isfinite(slow)
    np.testing.assert_allclose(fast[m], slow[m], rtol=1e-4, atol=1e-6)


def test_wedge_path_nonzero_offset():
    """wedge_offset must track the cost producer's disparity_offset."""
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    rng = np.random.default_rng(7)
    left = rng.random((12, 20), np.float32)
    right = rng.random((12, 20), np.float32)
    vol = np.asarray(ssd_cost_volume.__wrapped__(
        left, right, max_disparity=6, kernel_size=2, disparity_offset=3))
    fast = np.asarray(guided_filter_aggregate(vol, left, radius=2,
                                              wedge_offset=3))
    slow = np.asarray(guided_filter_aggregate(vol, left, radius=2))
    assert np.array_equal(np.isinf(fast), np.isinf(slow))
    m = np.isfinite(slow)
    np.testing.assert_allclose(fast[m], slow[m], rtol=1e-4, atol=1e-6)


def test_wedge_path_bf16_roundtrip(masked_volume):
    vol, left = masked_volume
    out16 = guided_filter_aggregate(jnp.asarray(vol, jnp.bfloat16), left,
                                    radius=2, wedge_offset=0)
    assert out16.dtype == jnp.bfloat16
    out32 = np.asarray(guided_filter_aggregate(vol, left, radius=2,
                                               wedge_offset=0))
    m = np.isfinite(out32)
    np.testing.assert_allclose(np.asarray(out16, np.float32)[m], out32[m],
                               rtol=0.02, atol=0.01)


def test_wedge_path_validation(masked_volume):
    vol, left = masked_volume
    with pytest.raises(ValueError, match="mutually exclusive"):
        guided_filter_aggregate(vol, left, wedge_offset=0,
                                assume_finite=True)
    with pytest.raises(ValueError, match="subsampled"):
        guided_filter_aggregate(vol, left, wedge_offset=0, subsample=2)
    with pytest.raises(ValueError, match="wedge_offset must be"):
        guided_filter_aggregate(vol, left, wedge_offset=-1)


def test_registry_pipeline_cvf_uses_wedge_path():
    """create_pipeline wires wedge_offset=0 (every registry cost writes
    exactly the wedge); result must track the generic-path pipeline."""
    from stereomatch_tpu.cli_common import create_pipeline
    from stereomatch_tpu.cost import SSD
    left, right, _ = synthetic_stereo_pair(24, 32, D, seed=2)
    pipe = create_pipeline("ssd", "wta", "cvf", max_disparity=D)
    assert pipe.aggregation.wedge_offset == 0
    vol = SSD(D, kernel_size=7)(left, right)
    ref = np.asarray(WinnerTakesAll()(
        guided_filter_aggregate(vol, left)))
    out = np.asarray(pipe.estimate(left, right))
    # Same masked means up to association: identical WTA picks away
    # from near-ties; allow a small tie-flip fraction.
    assert (out == ref).mean() > 0.98


def test_matches_oracle_all_finite():
    rng = np.random.default_rng(3)
    vol = rng.random((9, 11, 5), np.float32)
    guide = rng.random((9, 11), np.float32)
    out = np.asarray(guided_filter_aggregate(vol, guide, radius=3,
                                             eps=1e-3))
    ref = _gf_oracle(vol, guide, radius=3, eps=1e-3)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_assume_finite_equals_masked_on_finite_volume():
    rng = np.random.default_rng(5)
    vol = rng.random((12, 9, 4), np.float32)
    guide = rng.random((12, 9), np.float32)
    masked = np.asarray(guided_filter_aggregate(vol, guide, radius=2))
    fast = np.asarray(guided_filter_aggregate(vol, guide, radius=2,
                                              assume_finite=True))
    np.testing.assert_allclose(fast, masked, rtol=1e-6, atol=1e-7)


def test_invalid_cells_preserved_and_finite_elsewhere(masked_volume):
    vol, left = masked_volume
    out = np.asarray(guided_filter_aggregate(vol, left, radius=2))
    assert np.array_equal(np.isinf(out), np.isinf(vol))
    assert np.isfinite(out[np.isfinite(vol)]).all()


def test_bf16_storage_roundtrip(masked_volume):
    vol, left = masked_volume
    out16 = guided_filter_aggregate(jnp.asarray(vol, jnp.bfloat16), left,
                                    radius=2)
    assert out16.dtype == jnp.bfloat16
    out32 = np.asarray(guided_filter_aggregate(vol, left, radius=2))
    m = np.isfinite(out32)
    np.testing.assert_allclose(np.asarray(out16, np.float32)[m], out32[m],
                               rtol=0.02, atol=0.01)


def test_costfilter_validation(masked_volume):
    vol, left = masked_volume
    with pytest.raises(validation.ShapeError):
        CostFilter()(vol, left[:-1])
    with pytest.raises(validation.DTypeError):
        CostFilter()(np.zeros_like(vol, np.int32), left)
    # Registry-compat kwargs are accepted (and ignored).
    out = CostFilter(radius=2, penalty1=0.5, penalty2=9.0,
                     backend="xla")(vol, left)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(guided_filter_aggregate(vol, left, radius=2)))


def test_pipeline_quality_on_noisy_scene():
    """CVF must reduce WTA bad-pixel error vs no aggregation (the whole
    point of aggregating) once the per-pixel cost is ambiguous — a
    noise-free synthetic scene gives a nearly noise-free census cost
    with nothing to aggregate, so perturb the images first."""
    left, right, gt = synthetic_stereo_pair(40, 56, D, seed=9)
    rng = np.random.default_rng(0)
    left = np.clip(left + rng.normal(0, 0.08, left.shape), 0, 1)
    right = np.clip(right + rng.normal(0, 0.08, right.shape), 0, 1)
    left = left.astype(np.float32)
    right = right.astype(np.float32)
    vol = Census(D)(left, right).astype(jnp.float32)
    raw = np.asarray(WinnerTakesAll()(vol))
    agg = np.asarray(WinnerTakesAll()(CostFilter(radius=4)(vol, left)))
    bad_raw = (np.abs(raw - gt) > 1).mean()
    bad_agg = (np.abs(agg - gt) > 1).mean()
    assert bad_agg < bad_raw


def test_registry_pipeline():
    from stereomatch_tpu.cli_common import create_pipeline
    left, right, _ = synthetic_stereo_pair(24, 32, D, seed=2)
    pipe = create_pipeline("census", "wta", "cvf", max_disparity=D)
    out = np.asarray(pipe.estimate(left, right))
    assert out.shape == left.shape and out.dtype == np.int32
    with pytest.raises(ValueError):
        create_pipeline("ssd", "wta", "cvf", max_disparity=D,
                        volume_dtype="int32")


def test_streaming_estimator_cvf_matches_pipeline():
    from stereomatch_tpu.cli_common import create_pipeline
    from stereomatch_tpu.stream import StreamingEstimator
    left, right, _ = synthetic_stereo_pair(24, 32, D, seed=4)
    ref = np.asarray(
        create_pipeline("census", "wta", "cvf",
                        max_disparity=D).estimate(left, right))
    est = StreamingEstimator(D, batch=2, cost="census",
                             aggregation="cvf", reducer="wta")
    out = np.asarray(est.estimate_batch(np.stack([left] * 2),
                                        np.stack([right] * 2)))
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], ref)


# --------------------------------------------------------------------------
# Row-sharded parity (8-device CPU mesh)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh():
    import jax
    from stereomatch_tpu.parallel import make_mesh
    assert len(jax.devices()) >= 8, "tests need the 8-device CPU mesh"
    return make_mesh(jax.devices()[:8], n_batch=2)   # 4 row tiles


def test_sharded_cvf_matches_single_chip(mesh):
    """Bit-exact: halo rows make every window see the same values in the
    same reduce_window order, out-of-image halo rows are +inf-poisoned
    (invalid, contributing exact zeros — see _local_cvf)."""
    from stereomatch_tpu.parallel import ShardedPipeline
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    vol = SSD(D, kernel_size=3)(left, right)
    ref = np.asarray(WinnerTakesAll()(
        guided_filter_aggregate(vol, left, radius=3)))
    pipe = ShardedPipeline(mesh, D, kernel_size=3, aggregation="cvf",
                           cvf_radius=3, reducer="wta")
    out = np.asarray(pipe.estimate(np.stack([left] * 2),
                                   np.stack([right] * 2)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], ref)


def test_tiled2d_cvf_matches_single_chip():
    """Under 2-D tiling CVF is EXACT (finite support via 2r halos in both
    axes, +inf-poisoned outside the true image) — unlike SGM, whose
    overlap extension is a warm-up approximation."""
    from stereomatch_tpu.parallel import make_mesh_2d, make_tiled2d_estimate
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    vol = SSD(D, kernel_size=3)(left, right)
    ref = np.asarray(WinnerTakesAll()(
        guided_filter_aggregate(vol, left, radius=3)))
    mesh2 = make_mesh_2d(n_batch=2, n_tile=2, n_tile_w=2)
    fn = make_tiled2d_estimate(mesh2, max_disparity=D, kernel_size=3,
                               aggregation="cvf", cvf_radius=3,
                               backend="xla")
    out = np.asarray(fn(np.stack([left] * 2), np.stack([right] * 2)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], ref)


def test_disp_sharded_cvf_matches_single_chip():
    """CVF is per-disparity-slice, so it is the one aggregation that
    composes with disparity-block sharding (SGM/DP reduce over all of D
    every step and stay whole-D by design)."""
    from stereomatch_tpu.parallel import make_disp_mesh, make_disp_sharded_wta
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    vol = SSD(D, kernel_size=3)(left, right)
    ref = np.asarray(WinnerTakesAll()(
        guided_filter_aggregate(vol, left, radius=3)))
    mesh = make_disp_mesh(n_disp=8)
    fn = make_disp_sharded_wta(mesh, max_disparity=D, kernel_size=3,
                               aggregation="cvf", cvf_radius=3)
    np.testing.assert_array_equal(np.asarray(fn(left, right)), ref)


def test_disp_sharded_sgm_rejected():
    from stereomatch_tpu.parallel import make_disp_mesh, make_disp_sharded_wta
    mesh = make_disp_mesh(n_disp=8)
    with pytest.raises(ValueError, match="disparity .*sharding supports"):
        make_disp_sharded_wta(mesh, max_disparity=D, aggregation="sgm")


def test_sharded_cvf_radius_too_large_raises(mesh):
    from stereomatch_tpu.parallel import ShardedPipeline
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    pipe = ShardedPipeline(mesh, D, kernel_size=3, aggregation="cvf",
                           cvf_radius=8, reducer="wta")  # 16 > Hl = 8
    with pytest.raises(ValueError, match="halo rows"):
        pipe.estimate(np.stack([left] * 2), np.stack([right] * 2))


def test_sharded_cvf_bf16_matches_single_chip(mesh):
    """bf16 volume storage through the sharded cvf: same widen-on-load
    discipline as the kernels, bit-exact vs the single-chip bf16 run."""
    import jax.numpy as jnp
    from stereomatch_tpu.parallel import ShardedPipeline
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=6)
    vol = SSD(D, kernel_size=3,
              cost_volume_dtype=jnp.bfloat16)(left, right)
    ref = np.asarray(WinnerTakesAll()(
        guided_filter_aggregate(vol, left, radius=3)))
    pipe = ShardedPipeline(mesh, D, kernel_size=3, aggregation="cvf",
                           cvf_radius=3, reducer="wta",
                           cost_dtype=jnp.bfloat16)
    out = np.asarray(pipe.estimate(np.stack([left] * 2),
                                   np.stack([right] * 2)))
    np.testing.assert_array_equal(out[0], ref)


def test_bad_radius_and_eps_raise(masked_volume):
    vol, left = masked_volume
    with pytest.raises(ValueError, match="radius must be"):
        guided_filter_aggregate(vol, left, radius=-1)
    with pytest.raises(ValueError, match="eps must be"):
        guided_filter_aggregate(vol, left, radius=2, eps=0.0)


def test_subsample_one_is_exact(masked_volume):
    vol, left = masked_volume
    base = np.asarray(guided_filter_aggregate(vol, left, radius=2))
    s1 = np.asarray(guided_filter_aggregate(vol, left, radius=2,
                                            subsample=1))
    np.testing.assert_array_equal(s1, base)


def test_subsample_tracks_exact_on_structured_guide():
    """Fast Guided Filter: on a piecewise-smooth (real-image-like) guide
    the subsampled statistics reproduce the exact filter closely —
    measured here: ~2% mean relative deviation and >95% identical WTA
    disparities at s=2.  (On pure-noise guides the approximation
    degrades, like every guide-based method; the quality test below
    covers that regime against ground truth instead.)"""
    from stereomatch_tpu.ops.disparity import winner_takes_all
    h, w, dd = 32, 40, 8
    xx = np.mgrid[0:h, 0:w][1].astype(np.float32)
    guide = (0.3 + 0.4 * xx / w)
    guide[8:20, 10:22] = 0.9
    guide[22:30, 25:36] = 0.1
    guide = guide.astype(np.float32)
    rng = np.random.default_rng(0)
    gt = np.where(guide > 0.5, 5.0, 2.0)
    d = np.arange(dd, dtype=np.float32)
    vol = ((d[None, None, :] - gt[:, :, None]) ** 2
           + rng.normal(0, 0.8, (h, w, dd))).astype(np.float32)
    exact = np.asarray(guided_filter_aggregate(vol, guide, radius=4))
    fast = np.asarray(guided_filter_aggregate(vol, guide, radius=4,
                                              subsample=2))
    rel = np.abs(fast - exact).mean() / np.abs(exact).mean()
    assert rel < 0.05
    de = np.asarray(winner_takes_all(exact))
    df = np.asarray(winner_takes_all(fast))
    assert (de == df).mean() > 0.9


def test_subsample_preserves_invalid(masked_volume):
    vol, left = masked_volume
    fast = np.asarray(guided_filter_aggregate(vol, left, radius=2,
                                              subsample=2))
    assert np.array_equal(np.isinf(fast), np.isinf(vol))
    assert np.isfinite(fast[np.isfinite(vol)]).all()


def test_subsample_quality_on_noisy_scene():
    """The fast path must retain CVF's accuracy win over raw WTA."""
    left, right, gt = synthetic_stereo_pair(40, 56, D, seed=9)
    rng = np.random.default_rng(0)
    left = np.clip(left + rng.normal(0, 0.08, left.shape),
                   0, 1).astype(np.float32)
    right = np.clip(right + rng.normal(0, 0.08, right.shape),
                    0, 1).astype(np.float32)
    vol = Census(D)(left, right).astype(jnp.float32)
    raw = np.asarray(WinnerTakesAll()(vol))
    fast = np.asarray(WinnerTakesAll()(guided_filter_aggregate(
        vol, left, radius=4, subsample=2)))
    assert (np.abs(fast - gt) > 1).mean() < (np.abs(raw - gt) > 1).mean()


def test_subsample_assume_finite_runs():
    rng = np.random.default_rng(8)
    vol = rng.random((16, 20, 4), np.float32)
    guide = rng.random((16, 20), np.float32)
    out = np.asarray(guided_filter_aggregate(vol, guide, radius=4,
                                             subsample=2,
                                             assume_finite=True))
    assert np.isfinite(out).all()


def test_estimate_refined_and_confidence_with_cvf():
    """The full post-processing surface (LR check, median, sub-pixel,
    PKRN confidence) composes with the cvf aggregation — the refine
    stages read whatever aggregated volume the pipeline produced."""
    from stereomatch_tpu.cli_common import create_pipeline
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=4)
    pipe = create_pipeline("census", "wta", "cvf", max_disparity=D,
                           cvf_radius=3)
    disp = np.asarray(pipe.estimate_refined(left, right, subpixel=True,
                                            median=True, lr_check=True))
    assert disp.dtype == np.float32 and np.isfinite(disp).all()
    conf = np.asarray(pipe.last_confidence())
    assert conf.shape == left.shape and np.isfinite(conf).all()
