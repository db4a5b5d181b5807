"""End-to-end smoke tests for the stm-image CLI.

Mirrors the reference's CLI smoke runs (testing.justfile:7-38) at toy
scale: synthetic stereo PNGs through ``main()``, asserting the output
image is written with the expected geometry.
"""

import numpy as np
import pytest
from PIL import Image

from stereomatch_tpu.cli import image as cli_image

from .conftest import synthetic_stereo_pair


@pytest.fixture(scope="module")
def png_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgcli")
    left, right, _ = synthetic_stereo_pair(24, 40, 8, seed=11)
    lp, rp = tmp / "left.png", tmp / "right.png"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    return str(lp), str(rp), (24, 40)


def test_image_cli_depthmap_only(png_pair, tmp_path):
    lp, rp, (h, w) = png_pair
    out = tmp_path / "depth.png"
    assert cli_image.main([lp, rp, "8", str(out)]) == 0
    img = np.array(Image.open(out))
    assert img.shape == (h, w, 3)


def test_image_cli_figure_mode(png_pair, tmp_path):
    lp, rp, (h, w) = png_pair
    out = tmp_path / "fig.png"
    assert cli_image.main([lp, rp, "8", str(out), "-fig", "-am", "sgm",
                           "--p1", "0.2", "--p2", "0.5",
                           "--backend", "xla", "-dm", "dyn"]) == 0
    img = np.array(Image.open(out))
    # three panels + two gutters, letterboxed to a common height
    assert img.shape[0] == h
    assert img.shape[1] == 3 * w + 2 * 8


def test_image_cli_confidence_output(png_pair, tmp_path):
    lp, rp, (h, w) = png_pair
    out = tmp_path / "d.png"
    conf_out = tmp_path / "conf.png"
    rc = cli_image.main([lp, rp, "8", str(out), "-am", "sgm",
                         "--confidence", str(conf_out)])
    assert rc == 0
    conf = np.array(Image.open(conf_out))
    assert conf.shape == (h, w)
    assert conf.dtype == np.uint8


def test_render_panels_colormaps_range():
    disp = np.arange(12, dtype=np.int32).reshape(3, 4)
    canvas = cli_image.render_panels(disp)
    assert canvas.shape == (3, 4, 3)
    assert canvas.dtype == np.uint8


def test_image_cli_pyramid_mode(png_pair, tmp_path):
    lp, rp, (h, w) = png_pair
    out = tmp_path / "pyr.png"
    assert cli_image.main([lp, rp, "8", str(out), "--pyramid", "1",
                           "--band-radius", "3"]) == 0
    img = np.array(Image.open(out))
    assert img.shape == (h, w, 3)


def test_image_cli_pyramid_refine(png_pair, tmp_path):
    """--pyramid --refine: in-scan sub-pixel output renders fine."""
    lp, rp, (h, w) = png_pair
    out = tmp_path / "pyr_refined.png"
    assert cli_image.main([lp, rp, "8", str(out), "--pyramid", "1",
                           "--refine"]) == 0
    img = np.array(Image.open(out))
    assert img.shape == (h, w, 3)


def test_image_cli_pyramid_rejects_volume_postprocessing(png_pair, tmp_path):
    lp, rp, _ = png_pair
    out = tmp_path / "pyr.png"
    assert cli_image.main([lp, rp, "8", str(out), "--pyramid", "1",
                           "--lr-check"]) == 2
    assert not out.exists()


def test_image_cli_speckle(png_pair, tmp_path):
    lp, rp, (h, w) = png_pair
    out = tmp_path / "speckle.png"
    assert cli_image.main([lp, rp, "8", str(out), "--speckle",
                           "--speckle-fill", "background",
                           "--backend", "xla"]) == 0
    img = np.array(Image.open(out))
    assert img.shape == (h, w, 3)
