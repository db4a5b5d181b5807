"""Disparity post-processing ops (beyond the reference's surface)."""

import numpy as np
import pytest

from stereomatch_tpu.ops.cost import ssd_cost_volume
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.ops.refine import (confidence_pkrn, fill_inconsistent,
                                        left_right_consistency,
                                        median_filter_3x3, right_disparity,
                                        subpixel_refine)

from .conftest import synthetic_stereo_pair


def test_subpixel_matches_hand_parabola():
    """A volume with a known quadratic minimum must interpolate to its
    analytic vertex."""
    height, width, max_disp = 2, 3, 8
    true_d = 3.3
    d_axis = np.arange(max_disp, dtype=np.float32)
    vol = np.broadcast_to((d_axis - true_d) ** 2,
                          (height, width, max_disp)).copy()
    disp = np.asarray(winner_takes_all(vol))
    assert (disp == 3).all()
    sub = np.asarray(subpixel_refine(vol, disp))
    np.testing.assert_allclose(sub, true_d, atol=1e-5)


def test_subpixel_borders_fall_back():
    vol = np.random.default_rng(0).random((4, 5, 6)).astype(np.float32)
    vol[..., 0] = -1.0                       # force argmin to the border
    disp = np.asarray(winner_takes_all(vol))
    sub = np.asarray(subpixel_refine(vol, disp))
    np.testing.assert_array_equal(sub, disp.astype(np.float32))


def test_subpixel_offset_bounded():
    rng = np.random.default_rng(1)
    vol = rng.random((8, 10, 12)).astype(np.float32)
    disp = np.asarray(winner_takes_all(vol))
    sub = np.asarray(subpixel_refine(vol, disp))
    assert np.all(np.abs(sub - disp) <= 0.5 + 1e-6)


def test_median_filter_kills_speckle():
    disp = np.full((9, 9), 5, np.int32)
    disp[4, 4] = 50                          # lone speckle
    out = np.asarray(median_filter_3x3(disp))
    assert out.dtype == np.int32
    assert (out == 5).all()


def test_median_filter_preserves_edges():
    disp = np.zeros((8, 8), np.int32)
    disp[:, 4:] = 10                         # clean step edge
    out = np.asarray(median_filter_3x3(disp))
    np.testing.assert_array_equal(out, disp)


def test_left_right_consistency_perfect_scene():
    """A constant-disparity pair is consistent everywhere the projection
    stays in-image; occluded-border columns are flagged."""
    d = 3
    disp_l = np.full((6, 16), d, np.int32)
    disp_r = np.full((6, 16), d, np.int32)
    mask = np.asarray(left_right_consistency(disp_l, disp_r))
    assert mask[:, d:].all()
    assert not mask[:, :d].any()             # projects out of image


def test_left_right_consistency_flags_mismatch():
    disp_l = np.full((4, 12), 2, np.int32)
    disp_r = np.full((4, 12), 2, np.int32)
    disp_r[:, 4] = 9                         # corrupt where x-2 == 4
    mask = np.asarray(left_right_consistency(disp_l, disp_r))
    assert not mask[:, 6].any()
    assert mask[:, 7:].all()


def test_fill_inconsistent_takes_background_side():
    """Occlusion fill = min of the nearest consistent disparities (the
    background side), per the standard SGM occlusion treatment."""
    disp = np.asarray([[1, 1, 7, 4, 4]], np.int32)
    mask = np.asarray([[True, True, False, True, True]])
    out = np.asarray(fill_inconsistent(disp, mask))
    np.testing.assert_array_equal(out[0], [1, 1, 1, 4, 4])


def test_fill_inconsistent_left_edge_uses_right():
    disp = np.asarray([[9, 4, 4]], np.int32)
    mask = np.asarray([[False, True, True]])
    out = np.asarray(fill_inconsistent(disp, mask))
    np.testing.assert_array_equal(out[0], [4, 4, 4])


def test_confidence_pkrn_basics():
    vol = np.full((2, 3, 8), 10.0, np.float32)
    vol[0, 0, 3] = 1.0                       # unambiguous minimum
    vol[0, 1, :] = 5.0                       # all ties
    vol[0, 2, :] = np.inf                    # no finite hypotheses
    vol[0, 2, 0] = 2.0                       # ...except one
    conf = np.asarray(confidence_pkrn(vol))
    assert conf[0, 0] == pytest.approx(0.9)
    assert conf[0, 1] == 0.0
    assert conf[0, 2] == 0.0                 # < 2 finite lanes
    assert conf.min() >= 0.0 and conf.max() <= 1.0


def test_confidence_correlates_with_correctness():
    """Confidence must be higher on pixels the pipeline got right than on
    pixels it got wrong (the property consumers rely on)."""
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    D = 16
    left, right, gt = synthetic_stereo_pair(48, 64, D, seed=29)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    agg = semiglobal_aggregate(vol, left)
    disp = np.asarray(winner_takes_all(agg))
    conf = np.asarray(confidence_pkrn(agg))[:, D:]
    correct = (np.abs(disp - gt) <= 1)[:, D:]
    if correct.all() or not correct.any():
        pytest.skip("degenerate scene")
    assert conf[correct].mean() > conf[~correct].mean()


def test_pipeline_estimate_refined():
    """Pipeline.estimate_refined: all stages compose; sub-pixel output is
    float32 within 0.5 of the median-filtered integer estimate."""
    from stereomatch_tpu.cli_common import create_pipeline
    D = 16
    left, right, gt = synthetic_stereo_pair(32, 48, D, seed=17)
    pipe = create_pipeline("ssd", "wta", "sgm", max_disparity=D)
    base = np.asarray(pipe.estimate(left, right))
    refined = np.asarray(pipe.estimate_refined(left, right, lr_check=True))
    assert refined.dtype == np.float32
    assert refined.shape == base.shape
    smoothed = np.asarray(median_filter_3x3(
        np.asarray(fill_inconsistent(
            base, left_right_consistency(
                base, np.asarray(right_disparity(
                    lambda l, r: pipe.estimate_fn()(l, r), left, right)))))))
    assert np.all(np.abs(refined - smoothed) <= 0.5 + 1e-6)


def test_pipeline_last_confidence():
    from stereomatch_tpu.cli_common import create_pipeline
    D = 16
    left, right, _ = synthetic_stereo_pair(24, 32, D, seed=31)
    pipe = create_pipeline("ssd", "wta", "sgm", max_disparity=D)
    with pytest.raises(RuntimeError):
        pipe.last_confidence()
    pipe.estimate(left, right)
    conf = np.asarray(pipe.last_confidence())
    assert conf.shape == left.shape
    assert 0.0 <= conf.min() and conf.max() <= 1.0


def test_image_cli_refined(tmp_path):
    from PIL import Image
    from stereomatch_tpu.cli import image as cli_image
    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=19)
    lp, rp = tmp_path / "l.png", tmp_path / "r.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    out = tmp_path / "d.png"
    rc = cli_image.main([str(lp), str(rp), "8", str(out),
                         "-am", "sgm", "--refine", "--lr-check"])
    assert rc == 0
    assert np.array(Image.open(out)).shape == (24, 40, 3)


def test_full_refinement_chain_on_synthetic_scene():
    """End-to-end plumbing: pipeline -> LR check -> fill -> median ->
    subpixel.  The synthetic generator has no true occlusions (every left
    pixel has a perfect right match), so the quality assertions are: the
    median+subpixel steps never hurt, the mask is mostly consistent, and
    the LR fill touches only masked pixels."""
    D = 16
    left, right, gt = synthetic_stereo_pair(40, 64, D, seed=13)

    def pipeline(l, r):
        vol = ssd_cost_volume(l, r, max_disparity=D, kernel_size=3)
        return winner_takes_all(vol)

    disp_l = np.asarray(pipeline(left, right))
    disp_r = np.asarray(right_disparity(pipeline, left, right))
    mask = np.asarray(left_right_consistency(disp_l, disp_r))
    assert mask.mean() > 0.8
    filled = np.asarray(fill_inconsistent(disp_l, mask))
    np.testing.assert_array_equal(filled[mask], disp_l[mask])

    def bad(d):
        return np.mean((np.abs(d - gt) > 1)[:, D:])

    smoothed = np.asarray(median_filter_3x3(disp_l))
    assert bad(smoothed) <= bad(disp_l) + 1e-9

    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    sub = np.asarray(subpixel_refine(vol, smoothed.astype(np.int32)))
    assert sub.dtype == np.float32
    # Sub-pixel offsets are bounded by 0.5, so with the threshold widened
    # accordingly the refined map cannot have more bad pixels (integer gt
    # makes a tighter claim inherently rounding-sensitive).
    assert np.mean((np.abs(sub - gt) > 1.5)[:, D:]) <= bad(smoothed) + 1e-9


def test_confidence_gating_marks_unknown_and_improves_kept():
    """min_confidence: gated pixels become 0 (Middlebury unknown), dtype
    is preserved, and the kept subset's bad-pixel ratio does not exceed
    the ungated one (PKRN removes ambiguous matches first)."""
    from stereomatch_tpu.cli_common import create_pipeline
    D = 16
    left, right, gt = synthetic_stereo_pair(40, 64, D, seed=23)
    pipe = create_pipeline("ssd", "wta", "sgm", max_disparity=D)

    plain = np.asarray(pipe.estimate_refined(left, right, subpixel=False,
                                             median=False))
    gated = np.asarray(pipe.estimate_refined(left, right, subpixel=False,
                                             median=False,
                                             min_confidence=0.05))
    assert gated.dtype == plain.dtype            # int32 without subpixel
    conf = np.asarray(pipe.last_confidence())
    dropped = conf < 0.05
    assert 0 < dropped.sum() < dropped.size
    np.testing.assert_array_equal(gated[dropped], 0)
    np.testing.assert_array_equal(gated[~dropped], plain[~dropped])

    valid = np.ones_like(gt, bool)
    valid[:, :D] = False
    def bad(d, keep):
        m = valid & keep
        return np.mean((np.abs(d - gt) > 1)[m])
    assert bad(gated, ~dropped) <= bad(plain, np.ones_like(dropped)) + 1e-9

    # Float path: gating applies after sub-pixel, output stays float32.
    gated_f = np.asarray(pipe.estimate_refined(left, right,
                                               min_confidence=0.05))
    assert gated_f.dtype == np.float32
    np.testing.assert_array_equal(gated_f[dropped], 0.0)


def test_image_cli_min_confidence(tmp_path):
    from PIL import Image
    from stereomatch_tpu.cli import image as cli_image
    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=29)
    lp, rp = tmp_path / "l.png", tmp_path / "r.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    out = tmp_path / "d.png"
    rc = cli_image.main([str(lp), str(rp), "8", str(out),
                         "-am", "sgm", "--min-confidence", "0.02"])
    assert rc == 0
    assert np.array(Image.open(out)).shape == (24, 40, 3)


def test_speckle_mask_kills_isolated_blob():
    from stereomatch_tpu.ops.refine import speckle_mask
    disp = np.full((24, 32), 10.0, np.float32)
    disp[10:12, 14:16] = 40.0                 # 2x2 outlier blob
    mask = np.asarray(speckle_mask(disp))
    assert not mask[10:12, 14:16].any()       # speckle masked
    outside = np.ones_like(mask, bool)
    outside[10:12, 14:16] = False
    assert mask[outside].all()                # coherent surface kept


def test_speckle_mask_keeps_large_regions_and_borders():
    from stereomatch_tpu.ops.refine import speckle_mask
    disp = np.full((24, 32), 10.0, np.float32)
    disp[:, 16:] = 40.0                       # two large half-planes
    mask = np.asarray(speckle_mask(disp))
    assert mask.all()                         # incl. corners and the seam


def test_filter_speckles_zero_and_background():
    from stereomatch_tpu.ops.refine import filter_speckles
    disp = np.full((24, 32), 10.0, np.float32)
    disp[10:12, 14:16] = 40.0
    out = np.asarray(filter_speckles(disp, fill="zero"))
    assert (out[10:12, 14:16] == 0).all()
    out = np.asarray(filter_speckles(disp, fill="background"))
    assert (out[10:12, 14:16] == 10.0).all()
    assert (out == 10.0).all()


def test_filter_speckles_rejects_unknown_fill():
    import pytest as _pytest
    from stereomatch_tpu.ops.refine import filter_speckles
    with _pytest.raises(ValueError):
        filter_speckles(np.zeros((4, 4), np.float32), fill="nearest")


def test_right_volume_from_left_oracle():
    """C_R[y,x,d] = C_L[y,x+d,d], +inf off the right edge — exact vs a
    numpy loop, including the left volume's own +inf validity wedge."""
    from stereomatch_tpu.ops.refine import right_volume_from_left
    rng = np.random.default_rng(3)
    height, width, max_disp = 7, 19, 6
    vol = rng.random((height, width, max_disp)).astype(np.float32)
    for x in range(width):                     # d > x invalid, like real volumes
        vol[:, x, min(x + 1, max_disp):] = np.inf
    got = np.asarray(right_volume_from_left(vol))
    want = np.full_like(vol, np.inf)
    for d in range(max_disp):
        for x in range(width - d):
            want[:, x, d] = vol[:, x + d, d]
    np.testing.assert_array_equal(got, want)


def test_right_volume_from_left_keeps_storage_dtype():
    import jax.numpy as jnp
    from stereomatch_tpu.ops.refine import right_volume_from_left
    vol = jnp.zeros((4, 8, 4), jnp.bfloat16)
    assert right_volume_from_left(vol).dtype == jnp.bfloat16


def test_right_disparity_volume_equals_mirror_for_symmetric_cost():
    """With a mirror-symmetric matching cost (per-pixel census Hamming:
    centered window, no box sum) the re-indexed right disparity IS the
    mirrored-pipeline right disparity, everywhere: matching R(x) to L(x+d)
    scores the identical pixel pairs either way and WTA tie order (lowest
    d) is preserved by the re-index."""
    from stereomatch_tpu.ops.cost import census_hamming_cost_volume
    from stereomatch_tpu.ops.refine import right_disparity_from_volume
    D = 12
    left, right, _ = synthetic_stereo_pair(26, 64, D, seed=5)

    def cost(l, r):
        return census_hamming_cost_volume(l, r, max_disparity=D,
                                          kernel_size=1)

    via_mirror = np.asarray(right_disparity(
        lambda l, r: winner_takes_all(cost(l, r)), left, right))
    via_volume = np.asarray(right_disparity_from_volume(cost(left, right)))
    np.testing.assert_array_equal(via_volume, via_mirror)


def test_right_disparity_volume_close_to_mirror_on_ssd():
    """SSD's half-open [x-k, x+k) window is NOT mirror-symmetric, so the
    two right-disparity estimates legitimately differ near window edges —
    but they must agree almost everywhere on a matchable scene."""
    from stereomatch_tpu.ops.refine import right_disparity_from_volume
    D, k = 12, 3
    left, right, _ = synthetic_stereo_pair(26, 64, D, seed=5)

    def pipeline(l, r):
        return winner_takes_all(
            ssd_cost_volume(l, r, max_disparity=D, kernel_size=k))

    via_mirror = np.asarray(right_disparity(pipeline, left, right))
    via_volume = np.asarray(right_disparity_from_volume(
        ssd_cost_volume(left, right, max_disparity=D, kernel_size=k)))
    assert (via_volume == via_mirror).mean() > 0.9
    assert (np.abs(via_volume - via_mirror) <= 1).mean() > 0.95


def test_estimate_refined_lr_mode_volume():
    """lr_mode='volume' composes in the pipeline and stays close to the
    mirror-mode result (the synthetic scene has no occlusions, so the two
    right-disparity estimates agree almost everywhere)."""
    from stereomatch_tpu.cli_common import create_pipeline
    D = 16
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=17)
    pipe = create_pipeline("ssd", "wta", "sgm", max_disparity=D)
    with pytest.raises(ValueError):
        pipe.estimate_refined(left, right, lr_check=True, lr_mode="nope")
    via_volume = np.asarray(pipe.estimate_refined(
        left, right, lr_check=True, lr_mode="volume"))
    via_mirror = np.asarray(pipe.estimate_refined(
        left, right, lr_check=True, lr_mode="mirror"))
    assert via_volume.shape == via_mirror.shape
    assert np.mean(np.abs(via_volume - via_mirror) <= 1.0) > 0.9


def _wmf_oracle(disp, guide, window, sigma, n_bins):
    r = window // 2
    height, width = disp.shape
    bins = np.clip(np.round(disp.astype(np.float32)),
                   0, n_bins - 1).astype(int)
    out = np.zeros_like(disp)
    for y in range(height):
        for x in range(width):
            hist = np.zeros(n_bins, np.float32)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < height and 0 <= xx < width:
                        w = np.float32(np.exp(
                            -(guide[yy, xx] - guide[y, x]) ** 2
                            / (2 * np.float32(sigma) ** 2)))
                        hist[bins[yy, xx]] += w
            cum = np.cumsum(hist)
            out[y, x] = np.argmax(cum >= cum[-1] / 2)
    return out


@pytest.mark.parametrize("shape,window,seed", [
    ((14, 17), 5, 11),
    ((9, 23), 3, 2),
    ((16, 16), 7, 5),
])
def test_weighted_median_matches_oracle(shape, window, seed):
    from stereomatch_tpu.ops.refine import weighted_median_filter
    rng = np.random.default_rng(seed)
    disp = rng.integers(0, 12, shape).astype(np.int32)
    guide = rng.random(shape).astype(np.float32)
    got = np.asarray(weighted_median_filter(disp, guide, window=window,
                                            sigma=0.2, n_bins=16))
    want = _wmf_oracle(disp, guide, window, 0.2, 16)
    np.testing.assert_array_equal(got, want)


def test_weighted_median_float_input_rounds_to_bins():
    """Float (sub-pixel) input quantizes to bins; output is the float bin
    value in the input dtype."""
    from stereomatch_tpu.ops.refine import weighted_median_filter
    rng = np.random.default_rng(7)
    disp = (rng.random((10, 12)) * 11).astype(np.float32)
    guide = rng.random((10, 12)).astype(np.float32)
    got = np.asarray(weighted_median_filter(disp, guide, window=3,
                                            sigma=0.2, n_bins=16))
    want = _wmf_oracle(disp, guide, 3, 0.2, 16).astype(np.float32)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_weighted_median_preserves_edges_where_plain_median_blurs():
    """A one-pixel-wide disparity structure aligned with a strong guide
    edge survives the weighted median (affinity ~0 across the edge) but
    is erased by the plain 3x3 median."""
    from stereomatch_tpu.ops.refine import (median_filter_3x3,
                                            weighted_median_filter)
    disp = np.full((9, 9), 5, np.int32)
    disp[:, 4] = 20                       # thin structure
    guide = np.zeros((9, 9), np.float32)
    guide[:, 4] = 1.0                     # ... on a strong intensity edge
    plain = np.asarray(median_filter_3x3(disp))
    wmf = np.asarray(weighted_median_filter(disp, guide, window=3,
                                            sigma=0.05, n_bins=32))
    assert (plain[:, 4] == 5).all()       # plain median erases it
    np.testing.assert_array_equal(wmf, disp)   # WMF keeps it


def test_weighted_median_kills_speckle_on_flat_guide():
    from stereomatch_tpu.ops.refine import weighted_median_filter
    disp = np.full((9, 9), 5, np.int32)
    disp[4, 4] = 50                       # lone speckle
    guide = np.zeros((9, 9), np.float32)  # uniform guide = plain median
    out = np.asarray(weighted_median_filter(disp, guide, window=3,
                                            n_bins=64))
    assert out.dtype == np.int32
    assert (out == 5).all()


def test_estimate_refined_weighted_median_composes():
    """WMF in the pipeline chain: composes with the other stages and does
    not hurt accuracy on the synthetic scene (guide affinity keeps the
    smoothing inside surfaces)."""
    from stereomatch_tpu.cli_common import create_pipeline
    D = 16
    left, right, gt = synthetic_stereo_pair(40, 64, D, seed=13)
    pipe = create_pipeline("census", "wta", "sgm", max_disparity=D)

    def bad(d):
        return np.mean((np.abs(np.round(d) - gt) > 1)[:, D:])

    base = np.asarray(pipe.estimate_refined(left, right, subpixel=False,
                                            median=False))
    wmf = np.asarray(pipe.estimate_refined(
        left, right, subpixel=False, median=False, weighted_median=True,
        wmf_sigma=0.1))          # synthetic scenes are [0, 1] intensity
    assert wmf.shape == base.shape
    assert bad(wmf) <= bad(base) + 1e-9


def test_image_cli_wmf(tmp_path):
    from PIL import Image
    from stereomatch_tpu.cli import image as cli_image
    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=19)
    lp, rp = tmp_path / "l.png", tmp_path / "r.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    out = tmp_path / "d.png"
    rc = cli_image.main([str(lp), str(rp), "8", str(out),
                         "-am", "sgm", "--wmf"])
    assert rc == 0
    assert np.array(Image.open(out)).shape == (24, 40, 3)


def test_fgs_pass_matches_tridiagonal_solve():
    """One 1-D FGS pass must equal the exact numpy solve of its
    tridiagonal normal equations, row by row."""
    from stereomatch_tpu.ops.refine import _fgs_pass
    rng = np.random.default_rng(3)
    height, width = 5, 12
    u = rng.random((height, width)).astype(np.float32)
    c = rng.random((height, width)).astype(np.float32) + 0.1
    a = rng.random((height, width - 1)).astype(np.float32)
    lam = 2.5
    got = np.asarray(_fgs_pass(u, c, a, np.float32(lam)))
    for y in range(height):
        A = np.zeros((width, width), np.float64)
        for x in range(width):
            A[x, x] = c[y, x]
            if x + 1 < width:
                A[x, x] += lam * a[y, x]
                A[x, x + 1] = -lam * a[y, x]
                A[x + 1, x] = -lam * a[y, x]
            if x > 0:
                A[x, x] += lam * a[y, x - 1]
        want = np.linalg.solve(A, (c[y] * u[y]).astype(np.float64))
        np.testing.assert_allclose(got[y], want, rtol=2e-4, atol=2e-4)


def test_fgs_smooths_noise_but_keeps_edges():
    from stereomatch_tpu.ops.refine import fgs_smooth
    rng = np.random.default_rng(5)
    disp = np.full((24, 32), 10.0, np.float32)
    disp[:, 16:] = 30.0
    noisy = disp + rng.normal(0, 1.0, disp.shape).astype(np.float32)
    guide = np.zeros((24, 32), np.float32)
    guide[:, 16:] = 200.0                 # strong edge at the step
    out = np.asarray(fgs_smooth(noisy, guide, lam=64.0, sigma_color=8.0))
    # noise shrinks on both flats...
    assert out[:, :14].std() < 0.3 * noisy[:, :14].std()
    assert out[:, 18:].std() < 0.3 * noisy[:, 18:].std()
    # ...and the step survives (no cross-edge bleeding)
    assert abs(out[:, :15].mean() - 10.0) < 0.5
    assert abs(out[:, 17:].mean() - 30.0) < 0.5


def test_fgs_inpaints_zero_confidence_holes():
    """c = 0 pixels carry no data: a hole inside a flat region must be
    filled from its neighbors (the WLS occlusion-fill behavior)."""
    from stereomatch_tpu.ops.refine import fgs_smooth
    disp = np.full((16, 20), 7.0, np.float32)
    disp[6:10, 8:12] = 99.0               # garbage in the hole
    conf = np.ones((16, 20), np.float32)
    conf[6:10, 8:12] = 0.0
    guide = np.zeros((16, 20), np.float32)
    out = np.asarray(fgs_smooth(disp, guide, lam=64.0, sigma_color=8.0,
                                confidence=conf))
    np.testing.assert_allclose(out[6:10, 8:12], 7.0, atol=0.2)


def test_fgs_confidence_inpainting_on_occluded_scene():
    """The DisparityWLSFilter use: LR-consistency mask as the confidence,
    occluded pixels inpainted by the smoother.  Occluded-region error
    must drop substantially while non-occluded error stays close to raw.
    (On the noise-textured synthetic scenes UNCONDITIONAL fgs smoothing
    hurts bad-pixel — the guide's only true edges are depth-layer
    boundaries — measured 2.0% -> 2.3-18% over (lam, sigma); the filter
    is for real imagery and for confidence-driven filling.)"""
    from .conftest import synthetic_stereo_pair_occluded
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import census_hamming_cost_volume
    from stereomatch_tpu.ops import refine
    D = 16
    left, right, gt, occ = synthetic_stereo_pair_occluded(48, 64, D, seed=7)
    agg = semiglobal_aggregate(
        census_hamming_cost_volume(left, right, max_disparity=D), left)
    disp = np.asarray(winner_takes_all(agg))
    disp_r = np.asarray(refine.right_disparity_from_volume(agg))
    mask = np.asarray(refine.left_right_consistency(disp, disp_r, 1,
                                                    max_disparity=D))
    out = np.asarray(refine.fgs_smooth(
        disp.astype(np.float32), left, lam=16.0, sigma_color=0.05,
        confidence=mask.astype(np.float32)))

    region = np.s_[:, D:]

    def mae(d, sel):
        return np.abs(d[region] - gt[region])[sel].mean()

    occ_r = occ[region]
    assert mae(out, occ_r) < 0.75 * mae(disp.astype(np.float32), occ_r)
    assert mae(out, ~occ_r) < mae(disp.astype(np.float32), ~occ_r) + 0.5


def test_image_cli_fgs(tmp_path):
    from PIL import Image
    from stereomatch_tpu.cli import image as cli_image
    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=19)
    lp, rp = tmp_path / "l.png", tmp_path / "r.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    out = tmp_path / "d.png"
    rc = cli_image.main([str(lp), str(rp), "8", str(out),
                         "-am", "sgm", "--lr-check", "--lr-mode", "volume",
                         "--fgs", "64"])
    assert rc == 0
    assert np.array(Image.open(out)).shape == (24, 40, 3)
