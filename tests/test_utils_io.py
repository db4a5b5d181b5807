"""Numeric helpers, metrics, PFM/dataset IO, rectification, capture."""

import pickle

import numpy as np
import pytest

from stereomatch_tpu.io.calibration import StereoRectifier, warp_perspective
from stereomatch_tpu.io.capture import (ImageSequenceCapture,
                                        StereoCaptureImage,
                                        split_side_by_side,
                                        to_grayscale_array)
from stereomatch_tpu.io.data import (MiddleburyDataset,
                                     parse_middlebury_calib, read_pfm,
                                     write_pfm)
from stereomatch_tpu.metrics import (avg_abs_error, bad_pixel_ratio, evaluate,
                                     metrics_markdown_table, rmse)
from stereomatch_tpu.utils.numeric import (cdiv, is_power_of_two,
                                           next_power_of_2,
                                           round_up_to_multiple)


# ---- numeric (reference: tests/test_numeric.py:7-17) -----------------------

def test_is_power_of_two():
    assert is_power_of_two(1) and is_power_of_two(2) and is_power_of_two(128)
    assert not is_power_of_two(0)
    assert not is_power_of_two(100)


def test_next_power_of_2():
    assert next_power_of_2(0) == 1
    assert next_power_of_2(1) == 1
    assert next_power_of_2(100) == 128
    assert next_power_of_2(128) == 128
    assert next_power_of_2(129) == 256


def test_round_up_and_cdiv():
    assert round_up_to_multiple(100, 128) == 128
    assert cdiv(100, 128) == 1
    assert cdiv(256, 128) == 2


# ---- metrics ----------------------------------------------------------------

def test_metrics_perfect_prediction():
    gt = np.full((4, 4), 3.0, np.float32)
    assert float(rmse(gt, gt)) == 0.0
    assert float(avg_abs_error(gt, gt)) == 0.0
    assert float(bad_pixel_ratio(gt, gt)) == 0.0


def test_metrics_masking_invalid_gt():
    gt = np.array([[0.0, np.inf], [4.0, 4.0]], np.float32)  # 2 valid px
    pred = np.array([[99.0, 99.0], [4.0, 7.0]], np.float32)
    assert float(rmse(pred, gt)) == pytest.approx(np.sqrt(9 / 2))
    assert float(avg_abs_error(pred, gt)) == pytest.approx(1.5)
    assert float(bad_pixel_ratio(pred, gt, threshold=2.0)) == pytest.approx(0.5)


def test_metrics_markdown():
    rows = [dict(name="ssd-wta", rmse=1.0, avg_abs_error=0.5,
                 bad_pixel_ratio=0.25)]
    table = metrics_markdown_table(rows)
    assert "ssd-wta" in table and "25.00" in table
    assert "AUSE" not in table
    assert float(evaluate(np.ones((2, 2)), np.ones((2, 2)))["rmse"]) == 0.0
    rows.append(dict(name="x", rmse=1.0, avg_abs_error=0.5,
                     bad_pixel_ratio=0.25, ause=0.0321))
    table = metrics_markdown_table(rows)
    assert "AUSE" in table and "0.0321" in table
    assert " — |" in table  # the row without a confidence score


def test_sparsification_perfect_and_anticorrelated_confidence():
    from stereomatch_tpu.metrics import (sparsification_ause,
                                         sparsification_curve)
    rng = np.random.default_rng(3)
    gt = np.full((20, 20), 5.0, np.float32)
    err = rng.uniform(0.0, 6.0, gt.shape).astype(np.float32)
    pred = gt + err
    # Confidence that perfectly ranks by true error = oracle: AUSE == 0.
    perfect = (-err).astype(np.float32)
    assert sparsification_ause(pred, gt, perfect) == pytest.approx(0.0)
    # Anti-correlated confidence keeps the *worst* pixels: strictly
    # positive AUSE, and the curve never dips below the oracle.
    fractions, curve, oracle = sparsification_curve(pred, gt, err)
    assert fractions[0] == 0.0 and fractions[-1] == 1.0
    assert curve[0] == pytest.approx(np.mean(err > 2.0))
    assert np.all(curve >= oracle - 1e-12)
    assert sparsification_ause(pred, gt, err) > 0.05


def test_sparsification_invalid_gt_masked():
    from stereomatch_tpu.metrics import sparsification_ause
    gt = np.zeros((4, 4), np.float32)          # all-invalid ground truth
    pred = np.ones_like(gt)
    conf = np.ones_like(gt)
    assert sparsification_ause(pred, gt, conf) == 0.0


# ---- PFM / dataset ----------------------------------------------------------

def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((5, 9)).astype(np.float32)
    path = tmp_path / "disp.pfm"
    write_pfm(path, img)
    np.testing.assert_array_equal(read_pfm(path), img)


def test_middlebury_dataset(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(1)
    for scene in ["scene2", "scene10"]:
        d = tmp_path / scene
        d.mkdir()
        Image.fromarray((rng.random((6, 8, 3)) * 255).astype(np.uint8)).save(
            d / "im0.png")
        Image.fromarray((rng.random((6, 8, 3)) * 255).astype(np.uint8)).save(
            d / "im1.png")
        write_pfm(d / "disp0.pfm", rng.random((6, 8)).astype(np.float32))
        write_pfm(d / "disp1.pfm", rng.random((6, 8)).astype(np.float32))
        (d / "calib.txt").write_text("width=8\nheight=6\nndisp=16\n")

    ds = MiddleburyDataset(tmp_path)
    assert len(ds) == 2
    # natural sort: scene2 before scene10
    assert ds[0]["stereo_name"] == "scene2"
    item = ds[1]
    assert item["left"].shape == (6, 8, 3)
    assert item["gt_disparity"].shape == (6, 8)
    assert item["max_disparity"] == 16
    assert parse_middlebury_calib(tmp_path / "scene2" / "calib.txt") == dict(
        width=8, height=6, ndisp=16)


# ---- rectification ----------------------------------------------------------

def test_warp_identity():
    rng = np.random.default_rng(2)
    img = rng.random((6, 8)).astype(np.float32)
    out = np.asarray(warp_perspective(img, np.eye(3, dtype=np.float32)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_translation():
    img = np.zeros((6, 8), np.float32)
    img[2, 3] = 1.0
    # Forward map: destination = H @ source with tx=+2 -> pixel moves right.
    hmat = np.array([[1, 0, 2], [0, 1, 0], [0, 0, 1]], np.float32)
    out = np.asarray(warp_perspective(img, hmat))
    assert out[2, 5] == pytest.approx(1.0, abs=1e-5)
    assert out[2, 3] == pytest.approx(0.0, abs=1e-5)


def test_rectifier_state_dict_roundtrip():
    h0 = np.eye(3, dtype=np.float32)
    h1 = np.array([[1, 0, 1], [0, 1, 0], [0, 0, 1]], np.float32)
    rect = StereoRectifier(h0, h1)
    blob = pickle.dumps(rect.get_state_dict())
    rect2 = StereoRectifier.from_state_dict(pickle.loads(blob))
    np.testing.assert_array_equal(rect2.homography1, h1)
    img = np.random.default_rng(3).random((5, 7)).astype(np.float32)
    a, b = rect2(img, img)
    assert np.asarray(a).shape == img.shape
    inv = rect2.invert(np.asarray(b), 1)
    assert np.asarray(inv).shape == img.shape


def test_warp_invert_roundtrip():
    """invert() undoes the rectification warp away from borders."""
    rng = np.random.default_rng(4)
    img = rng.random((16, 16)).astype(np.float32)
    hmat = np.array([[1, 0, 3], [0, 1, 1], [0, 0, 1]], np.float32)
    rect = StereoRectifier(hmat, hmat)
    warped, _ = rect(img, img)
    restored = np.asarray(rect.invert(np.asarray(warped), 0))
    np.testing.assert_allclose(restored[4:12, 4:12], img[4:12, 4:12],
                               atol=1e-4)


# ---- capture ----------------------------------------------------------------

def test_split_side_by_side():
    frame = np.zeros((4, 10, 3), np.uint8)
    frame[:, :5] = 1
    frame[:, 5:] = 2
    cap = split_side_by_side(frame)
    assert cap.left.shape == (4, 5, 3) and np.all(cap.left == 1)
    assert cap.right.shape == (4, 5, 3) and np.all(cap.right == 2)
    assert cap.joined is frame
    left, right, joined = cap  # __iter__
    assert left is cap.left


def test_grayscale_conversion():
    bgr = np.zeros((2, 2, 3), np.uint8)
    bgr[..., 2] = 255  # red in BGR
    gray = to_grayscale_array(bgr)
    assert gray.shape == (2, 2)
    assert abs(int(gray[0, 0]) - 76) <= 1  # 0.299 * 255


def test_image_sequence_capture(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(5)
    for i in range(3):
        frame = (rng.random((4, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(frame).save(tmp_path / f"frame_{i}.png")
    cap = ImageSequenceCapture.from_directory(tmp_path)
    count = 0
    while True:
        ok, img = cap.read_next()
        if not ok:
            break
        assert isinstance(img, StereoCaptureImage)
        assert img.left.shape == (4, 4, 3)
        gray = img.to_grayscale()
        assert gray.left.shape == (4, 4)
        count += 1
    assert count == 3
