"""Coarse-to-fine pyramid pipeline (stereomatch_tpu/pyramid.py).

Beyond the reference's capability surface — no reference citation; the
accuracy assertions anchor the speed/accuracy trade against the full
resolution census pipeline on the shared synthetic scenes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.pyramid import (PyramidPipeline, band_refine_census,
                                     downsample2, upsample2_nearest)

from .conftest import synthetic_stereo_pair


def _bad_fraction(disp, gt, tol=1):
    disp = np.asarray(disp).astype(np.int64)
    gt = np.asarray(gt).astype(np.int64)
    return float((np.abs(disp - gt) > tol).mean())


def test_downsample2_mean_pools():
    img = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = np.asarray(downsample2(jnp.asarray(img)))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(
        out[0, 0], img[0:2, 0:2].mean())
    np.testing.assert_allclose(
        out[1, 2], img[2:4, 4:6].mean())


def test_upsample2_nearest_doubles_values():
    disp = jnp.asarray([[1, 3], [5, 0]], jnp.int32)
    up = np.asarray(upsample2_nearest(disp))
    assert up.shape == (4, 4)
    # one coarse pixel covers a 2x2 fine block; disparities double
    np.testing.assert_array_equal(up[0:2, 0:2], 2)
    np.testing.assert_array_equal(up[0:2, 2:4], 6)
    np.testing.assert_array_equal(up[2:4, 0:2], 10)
    np.testing.assert_array_equal(up[2:4, 2:4], 0)


def test_band_refine_recovers_gt_from_gt_anchor():
    """On a noiseless warp scene the Hamming cost of the true disparity is
    zero away from warp borders, so a band anchored at ground truth must
    stay at ground truth — away from disparity discontinuities, where the
    warp itself makes matches ambiguous."""
    left, right, gt = synthetic_stereo_pair(48, 64, 16, seed=11)
    disp = np.asarray(band_refine_census(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(gt),
        band_radius=3, max_disparity=16))
    gt = np.asarray(gt)
    interior = np.zeros_like(gt, bool)
    interior[4:-4, 20:-4] = True  # clear of census borders + d-invalid cols
    gy, gx = np.gradient(gt.astype(np.float32))
    smooth = (np.abs(gy) + np.abs(gx)) == 0
    for shift in range(1, 4):  # grow the discontinuity exclusion to +-3 px
        smooth &= np.roll(smooth, shift, 0) & np.roll(smooth, -shift, 0)
        smooth &= np.roll(smooth, shift, 1) & np.roll(smooth, -shift, 1)
    mask = interior & smooth
    assert mask.sum() > 100  # the assertion below isn't vacuous
    assert _bad_fraction(disp[mask], gt[mask], 0) == 0.0


def test_band_refine_corrects_off_by_small_errors():
    left, right, gt = synthetic_stereo_pair(48, 64, 16, seed=12)
    rng = np.random.default_rng(0)
    jitter = rng.integers(-2, 3, size=np.asarray(gt).shape).astype(np.int32)
    anchor = np.clip(np.asarray(gt) + jitter, 0, 15)
    disp = np.asarray(band_refine_census(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(anchor),
        band_radius=3, max_disparity=16))
    # refinement must beat the jittered anchor by a wide margin
    assert _bad_fraction(disp, gt, 0) < 0.5 * _bad_fraction(anchor, gt, 0)


@pytest.mark.parametrize("levels,limit", [(1, 0.15), (2, 0.20)])
def test_pyramid_accuracy_on_synthetic_scene(levels, limit):
    left, right, gt = synthetic_stereo_pair(64, 96, 32, seed=3)
    pipe = PyramidPipeline(max_disparity=32, levels=levels, band_radius=4)
    disp = pipe.estimate(left, right)
    assert disp.shape == np.asarray(gt).shape
    assert disp.dtype == jnp.int32
    assert _bad_fraction(disp, gt) < limit


def test_pyramid_handles_odd_geometry():
    """375-style odd heights are edge-padded internally and cropped back."""
    left, right, gt = synthetic_stereo_pair(45, 63, 16, seed=5)
    pipe = PyramidPipeline(max_disparity=16, levels=2, band_radius=4)
    disp = pipe.estimate(left, right)
    assert disp.shape == (45, 63)
    assert _bad_fraction(disp, gt) < 0.25


def test_pyramid_close_to_full_resolution_pipeline():
    """The headline trade: levels=1 should stay within a few points of the
    full-resolution census+SGM result on the synthetic scene."""
    from stereomatch_tpu.cli_common import create_pipeline

    left, right, gt = synthetic_stereo_pair(64, 96, 32, seed=3)
    full = create_pipeline("census", "wta", "sgm", max_disparity=32)
    bad_full = _bad_fraction(full.estimate(left, right), gt)
    pyr = PyramidPipeline(max_disparity=32, levels=1, band_radius=4)
    bad_pyr = _bad_fraction(pyr.estimate(left, right), gt)
    assert bad_pyr < bad_full + 0.06


def test_pyramid_validates_arguments():
    with pytest.raises(ValueError):
        PyramidPipeline(max_disparity=32, levels=0)
    with pytest.raises(ValueError):
        PyramidPipeline(max_disparity=30, levels=2)  # 30 % 4 != 0
    pipe = PyramidPipeline(max_disparity=16, levels=1)
    with pytest.raises(ValueError):
        pipe.estimate(np.zeros((4, 4, 3), np.float32),
                      np.zeros((4, 4, 3), np.float32))


def test_band_subpixel_matches_volume_subpixel():
    """Full-range band (anchor 0, radius >= D): the in-scan parabolic
    vertex must reproduce ops/refine.subpixel_refine gathering from the
    full census cost volume, at pixels where both are interior (winner
    not at a range border, all disparities image-valid)."""
    from stereomatch_tpu.ops.cost import census_hamming_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    from stereomatch_tpu.ops.refine import subpixel_refine

    D = 16
    left, right, _ = synthetic_stereo_pair(40, 64, D, seed=13)
    l, r = jnp.asarray(left), jnp.asarray(right)
    vol = census_hamming_cost_volume(l, r, max_disparity=D, window_size=5)
    wta = winner_takes_all(vol)
    want = np.asarray(subpixel_refine(vol, wta))

    sub = np.asarray(band_refine_census(
        l, r, jnp.zeros(l.shape, jnp.int32), band_radius=D,
        max_disparity=D, subpixel=True))
    got_int = np.asarray(band_refine_census(
        l, r, jnp.zeros(l.shape, jnp.int32), band_radius=D,
        max_disparity=D))

    w = np.asarray(wta)
    interior = (w > 0) & (w < D - 1) & \
        (np.arange(64)[None, :] >= D)          # every d image-valid
    np.testing.assert_array_equal(got_int[interior], w[interior])
    np.testing.assert_allclose(sub[interior], want[interior],
                               rtol=0, atol=1e-6)


def test_band_subpixel_stays_within_half_pixel():
    left, right, gt = synthetic_stereo_pair(48, 64, 16, seed=11)
    disp_i = np.asarray(band_refine_census(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(gt),
        band_radius=3, max_disparity=16))
    disp_f = np.asarray(band_refine_census(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(gt),
        band_radius=3, max_disparity=16, subpixel=True))
    assert disp_f.dtype == np.float32
    assert np.all(np.abs(disp_f - disp_i) <= 0.5)


def test_pyramid_estimate_refined():
    left, right, gt = synthetic_stereo_pair(64, 96, 32, seed=3)
    pipe = PyramidPipeline(max_disparity=32, levels=1, band_radius=4)
    disp_i = np.asarray(pipe.estimate(left, right))
    disp_f = np.asarray(pipe.estimate_refined(left, right))
    assert disp_f.dtype == np.float32
    # refined output tracks the integer result (median of +-0.5 offsets)
    assert np.abs(disp_f - disp_i).max() <= 1.0
    bad_i = _bad_fraction(disp_i, gt)
    bad_f = float((np.abs(disp_f - np.asarray(gt)) > 1).mean())
    assert bad_f <= bad_i + 0.01
