"""Disparity -> depth / point-cloud reconstruction (beyond the reference:
it stops at disparity maps; metric output uses the calib.txt fields the
reference's eval workflow already parses for ndisp, workflow.py:57)."""

import numpy as np
import pytest
from PIL import Image

from stereomatch_tpu.reconstruction import (CameraIntrinsics,
                                            depth_from_disparity, read_ply,
                                            reproject_disparity, write_ply)

CALIB_TXT = """cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]
cam1=[3997.684 0 1307.839; 0 3997.684 1011.728; 0 0 1]
doffs=131.111
baseline=193.001
width=2964
height=1988
ndisp=280
"""


@pytest.fixture()
def calib_file(tmp_path):
    path = tmp_path / "calib.txt"
    path.write_text(CALIB_TXT)
    return str(path)


def test_intrinsics_from_middlebury_calib(calib_file):
    intr = CameraIntrinsics.from_middlebury_calib(calib_file)
    assert intr.focal == pytest.approx(3997.684)
    assert intr.cx == pytest.approx(1176.728)
    assert intr.cy == pytest.approx(1011.728)
    assert intr.baseline == pytest.approx(193.001)
    assert intr.doffs == pytest.approx(131.111)


def test_intrinsics_requires_cam0(tmp_path):
    path = tmp_path / "calib.txt"
    path.write_text("width=10\nheight=10\nndisp=8\n")
    with pytest.raises(ValueError):
        CameraIntrinsics.from_middlebury_calib(str(path))


def test_depth_formula_and_invalid_pixels():
    intr = CameraIntrinsics(focal=100.0, cx=2.0, cy=1.0,
                            baseline=0.5, doffs=10.0)
    disp = np.array([[40, 90], [0, -5]], np.int32)
    depth = np.asarray(depth_from_disparity(disp, intr))
    # Z = f * B / (d + doffs)
    np.testing.assert_allclose(depth[0, 0], 100.0 * 0.5 / 50.0, rtol=1e-6)
    np.testing.assert_allclose(depth[0, 1], 100.0 * 0.5 / 100.0, rtol=1e-6)
    # Raw d <= 0 is the unknown marker even when d + doffs would be
    # positive — both map to 0.
    assert depth[1, 0] == 0.0
    assert depth[1, 1] == 0.0


def test_depth_invalid_maps_to_zero():
    intr = CameraIntrinsics(focal=100.0, cx=0, cy=0, baseline=1.0)
    disp = np.array([[0.0, -1.0, np.inf, np.nan, 4.0]], np.float32)
    depth = np.asarray(depth_from_disparity(disp, intr))
    assert depth[0, 0] == 0.0 and depth[0, 1] == 0.0
    assert depth[0, 2] == 0.0 and depth[0, 3] == 0.0
    np.testing.assert_allclose(depth[0, 4], 25.0, rtol=1e-6)


def test_reproject_principal_point_on_axis():
    intr = CameraIntrinsics(focal=50.0, cx=3.0, cy=2.0, baseline=2.0)
    disp = np.full((5, 7), 10.0, np.float32)
    pts = np.asarray(reproject_disparity(disp, intr))
    assert pts.shape == (5, 7, 3)
    z = 50.0 * 2.0 / 10.0
    np.testing.assert_allclose(pts[2, 3], [0.0, 0.0, z], atol=1e-5)
    # One pixel right of the principal point: x = z / f.
    np.testing.assert_allclose(pts[2, 4], [z / 50.0, 0.0, z], atol=1e-5)


def test_ply_round_trip_with_colors(tmp_path):
    pts = np.array([[[0.0, 0.0, 1.0], [1.0, -1.0, 2.0]],
                    [[0.5, 0.5, 0.0], [np.nan, 0.0, 3.0]]], np.float32)
    colors = np.array([[[255, 0, 0], [0, 255, 0]],
                       [[9, 9, 9], [0, 0, 255]]], np.uint8)
    path = tmp_path / "cloud.ply"
    n = write_ply(path, pts, colors=colors)
    assert n == 2  # z == 0 and NaN rows dropped
    got, rgb = read_ply(path)
    np.testing.assert_allclose(got, [[0, 0, 1], [1, -1, 2]], atol=1e-6)
    np.testing.assert_array_equal(rgb, [[255, 0, 0], [0, 255, 0]])


def test_ply_grayscale_mask_and_max_depth(tmp_path):
    pts = np.stack([np.zeros((2, 2)), np.zeros((2, 2)),
                    np.array([[1.0, 2.0], [3.0, 4.0]])], axis=-1)
    gray = np.array([[0.0, 0.5], [1.0, 0.25]], np.float32)
    mask = np.array([[True, True], [True, False]])
    path = tmp_path / "g.ply"
    n = write_ply(path, pts, colors=gray, mask=mask, max_depth=2.5)
    assert n == 2  # depth 3.0 cut by max_depth, depth 4.0 by mask
    got, rgb = read_ply(path)
    np.testing.assert_allclose(got[:, 2], [1.0, 2.0])
    np.testing.assert_array_equal(rgb[:, 0], rgb[:, 1])
    np.testing.assert_array_equal(rgb[0], [0, 0, 0])
    np.testing.assert_array_equal(rgb[1], [127, 127, 127])


def test_ply_color_shape_mismatch_raises(tmp_path):
    pts = np.zeros((4, 3), np.float32)
    with pytest.raises(ValueError):
        write_ply(tmp_path / "x.ply", pts, colors=np.zeros((5, 3)))


def test_image_cli_depth_and_point_cloud(tmp_path):
    from stereomatch_tpu.cli import image as cli_image
    from stereomatch_tpu.io.data import read_pfm

    from .conftest import synthetic_stereo_pair

    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=11)
    lp, rp = tmp_path / "l.png", tmp_path / "r.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    calib = tmp_path / "calib.txt"
    calib.write_text("cam0=[100 0 20; 0 100 12; 0 0 1]\n"
                     "baseline=0.3\ndoffs=0\nwidth=40\nheight=24\nndisp=8\n")

    out = tmp_path / "d.png"
    depth_out = tmp_path / "depth.pfm"
    cloud_out = tmp_path / "cloud.ply"
    rc = cli_image.main([str(lp), str(rp), "8", str(out),
                         "--calib", str(calib), "--depth", str(depth_out),
                         "--point-cloud", str(cloud_out)])
    assert rc == 0
    depth = read_pfm(depth_out)
    assert depth.shape == (24, 40)
    assert np.isfinite(depth).all() and (depth >= 0).all()
    pts, rgb = read_ply(cloud_out)
    assert pts.shape[0] > 0 and pts.shape[0] <= 24 * 40
    assert rgb is not None and rgb.shape == (pts.shape[0], 3)
    # Depth values in the cloud match the PFM at valid pixels.
    assert set(np.round(pts[:, 2], 5)).issubset(
        set(np.round(depth[depth > 0], 5)))


def test_image_cli_point_cloud_requires_calib(tmp_path):
    from stereomatch_tpu.cli import image as cli_image
    lp = tmp_path / "l.png"
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(lp)
    rc = cli_image.main([str(lp), str(lp), "4", str(tmp_path / "o.png"),
                         "--point-cloud", str(tmp_path / "c.ply")])
    assert rc == 2
