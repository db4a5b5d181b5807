"""Offline tests for the stm-fetch dataset tooling: a file:// mirror built
in tmp stands in for vision.middlebury.edu, exercising the full
download/unpack/layout path without network."""

import zipfile

import numpy as np
import pytest

from stereomatch_tpu.cli import fetch as cli_fetch
from stereomatch_tpu.io import data


def _write_pfm_bytes(path, arr):
    data.write_pfm(path, arr)


@pytest.fixture()
def mirror2021(tmp_path):
    """A file:// mirror holding all.zip with one 2021-layout scene."""
    scene = tmp_path / "src" / "chess1"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    from PIL import Image
    for name in ("im0.png", "im1.png"):
        Image.fromarray(rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
                        ).save(scene / name)
    for name in ("disp0.pfm", "disp1.pfm"):
        _write_pfm_bytes(scene / name, rng.random((8, 10), np.float32) * 16)
    (scene / "calib.txt").write_text("width=10\nheight=8\nndisp=16\n")

    mirror = tmp_path / "mirror"
    mirror.mkdir()
    with zipfile.ZipFile(mirror / "all.zip", "w") as zf:
        for f in sorted(scene.rglob("*")):
            zf.write(f, f"chess1/{f.name}")
    return mirror.as_uri()


def test_fetch_middlebury2021(mirror2021, tmp_path):
    dest = tmp_path / "dl"
    rc = cli_fetch.main(["middlebury2021", "--dest", str(dest),
                         "--base-url", mirror2021])
    assert rc == 0
    assert not (dest / "all.zip").exists()        # archive cleaned up
    ds = data.MiddleburyDataset(dest)
    assert len(ds) == 1
    item = ds[0]
    assert item["stereo_name"] == "chess1"
    assert item["left"].shape[:2] == (8, 10)
    assert item["max_disparity"] == 16


def test_fetch_teddy2003(tmp_path):
    mirror = tmp_path / "mirror" / "teddy"
    mirror.mkdir(parents=True)
    rng = np.random.default_rng(1)
    from stereomatch_tpu import native
    for name in cli_fetch._2003_FILES:
        arr = rng.integers(0, 255, ((8, 10, 3) if name.endswith(".ppm")
                                    else (8, 10)), dtype=np.uint8)
        native.write_pnm(mirror / name, arr)

    dest = tmp_path / "dl"
    rc = cli_fetch.main(["teddy2003", "--dest", str(dest),
                         "--base-url", (tmp_path / "mirror").as_uri()])
    assert rc == 0
    for name in cli_fetch._2003_FILES:
        assert (dest / "teddy" / name).exists()
    img = data.load_image(dest / "teddy" / "im2.ppm", grayscale=True)
    assert img.shape == (8, 10)
