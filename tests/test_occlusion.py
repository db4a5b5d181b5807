"""Occlusion-aware evaluation: the physically-modeled synthetic scene.

synthetic_stereo_pair (flat warp) gives every left pixel a perfect right
match, so it can anchor matching *accuracy* but says nothing about
occlusion handling.  synthetic_stereo_pair_occluded models two depth
layers in the right view, producing left pixels with NO right
correspondence and an exact mask for them — the missing piece of the
offline evaluation proxy (real Middlebury scenes are occlusion-heavy).

These tests pin: matching quality ON matchable pixels, failure
concentration ON occluded pixels, left-right-check detection quality
against the true mask, and that occlusion filling genuinely repairs the
occluded regions (it cannot on the flat-warp scene, where there is
nothing to repair — see test_refine.py).
"""

import numpy as np
import pytest

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.cost import (census_hamming_cost_volume,
                                      ssd_cost_volume)
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.ops.refine import (fill_inconsistent,
                                        left_right_consistency,
                                        median_filter_3x3, right_disparity)

from .conftest import synthetic_stereo_pair_occluded

D = 16


@pytest.fixture(scope="module")
def scene():
    left, right, gt, occ = synthetic_stereo_pair_occluded(64, 96, D, seed=3)
    assert 0.03 < occ.mean() < 0.3      # the mask is non-trivial
    return left, right, gt, occ


def _pipeline(cost):
    def fn(l, r):
        if cost == "ssd":
            vol = ssd_cost_volume(l, r, max_disparity=D, kernel_size=3)
        else:
            vol = census_hamming_cost_volume(l, r, max_disparity=D)
        return winner_takes_all(semiglobal_aggregate(vol, l))
    return fn


def _masks(gt, occ):
    valid = ~occ
    valid[:, :D] = False
    return valid


@pytest.mark.parametrize("cost", ["ssd", "census"])
def test_matchable_pixels_recovered(scene, cost):
    left, right, gt, occ = scene
    disp = np.asarray(_pipeline(cost)(left, right))
    valid = _masks(gt, occ)
    bad_valid = np.mean((np.abs(disp - gt) > 1)[valid])
    bad_occ = np.mean((np.abs(disp - gt) > 1)[occ])
    assert bad_valid < 0.08             # matchable: single digits
    assert bad_occ > 2 * bad_valid      # failure concentrates on occlusion


def test_lr_check_detects_true_occlusion(scene):
    """The left-right consistency mask, scored against the exact
    occlusion ground truth: high recall, low false-positive rate."""
    left, right, gt, occ = scene
    fn = _pipeline("ssd")
    disp = np.asarray(fn(left, right))
    disp_r = np.asarray(right_disparity(fn, left, right))
    mask = np.asarray(left_right_consistency(disp, disp_r))
    valid = _masks(gt, occ)
    recall = np.mean(~mask[occ])
    false_pos = np.mean(~mask[valid])
    assert recall > 0.6
    assert false_pos < 0.08


def test_occlusion_fill_repairs_occluded_regions(scene):
    """Background fill must cut the occluded-region error substantially
    while leaving matchable pixels untouched."""
    left, right, gt, occ = scene
    fn = _pipeline("ssd")
    disp = np.asarray(fn(left, right))
    disp_r = np.asarray(right_disparity(fn, left, right))
    mask = np.asarray(left_right_consistency(disp, disp_r))
    filled = np.asarray(fill_inconsistent(disp, mask))

    def bad_occ(d):
        return np.mean((np.abs(d - gt) > 1)[occ])

    assert bad_occ(filled) < 0.6 * bad_occ(disp)
    np.testing.assert_array_equal(filled[mask], disp[mask])

    smoothed = np.asarray(median_filter_3x3(filled))
    valid = _masks(gt, occ)
    assert np.mean((np.abs(smoothed - gt) > 1)[valid]) < 0.08


def test_textured_surface_model():
    """The "textured" surface model (round 4): same occlusion physics,
    but surfaces carry distinct base intensities with smooth interiors —
    the regime guide-aware stages are built for.  Pin (a) the warp
    identity on unoccluded pixels, (b) that depth boundaries are
    intensity edges, and (c) that the guide-aware CVF beats its
    guide-blind ablation here (the claim benchmarks/textured_eval.json
    exists to support), where on noise scenes it does not."""
    import numpy as np
    from stereomatch_tpu.io.synthetic import stereo_pair_occluded
    from stereomatch_tpu.cost import Census
    from stereomatch_tpu.disparity_reduce import WinnerTakesAll
    from stereomatch_tpu.ops.cvf import guided_filter_aggregate

    def bad_pct(texture, guided):
        total_bad, total_px = 0, 0
        for seed in (100, 101, 102):
            left, right, gt, occ = stereo_pair_occluded(
                64, 96, 16, seed=seed, texture=texture)
            # (a) warp identity where visible and in-range.
            xs = np.arange(96)[None, :]
            vis = ~occ & (xs - gt >= 0)
            sampled = np.take_along_axis(
                right, np.clip(xs - gt, 0, 95), axis=1)
            np.testing.assert_allclose(left[vis], sampled[vis], atol=1e-6)
            vol = np.asarray(Census(16)(left, right)).astype(np.float32)
            eps = 1e-4 if guided else 1e6    # 1e6 = guide-blind ablation
            agg = guided_filter_aggregate(vol, left, radius=4, eps=eps)
            disp = np.asarray(WinnerTakesAll()(agg))
            m = ~occ
            total_bad += (np.abs(disp - gt)[m] > 1).sum()
            total_px += m.sum()
        return 100.0 * total_bad / total_px

    # (c): guided < blind on textured scenes.
    assert bad_pct("textured", True) < bad_pct("textured", False)

    # (b): boundary pixels carry intensity contrast. Spot-check one scene.
    left, _, gt, occ = stereo_pair_occluded(64, 96, 16, seed=100,
                                            texture="textured")
    edge = (np.abs(np.diff(gt.astype(np.float32), axis=1)) > 0)[:, :-1]
    jump = np.abs(np.diff(left, axis=1))[:, :-1]
    interior = ~edge
    assert jump[edge].mean() > 3 * jump[interior].mean()


def test_textured_rejects_unknown_model():
    import pytest
    from stereomatch_tpu.io.synthetic import stereo_pair_occluded
    with pytest.raises(ValueError, match="texture model"):
        stereo_pair_occluded(32, 48, 8, texture="marble")
