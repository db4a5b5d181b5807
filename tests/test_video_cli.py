"""Headless video CLI smoke test over an image-sequence directory."""

import numpy as np
import pytest

from stereomatch_tpu.cli.video import main as video_main

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


def test_video_cli_headless_imgdir(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    sbs = np.concatenate([(left * 255).astype(np.uint8),
                          (right * 255).astype(np.uint8)], axis=1)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(3):
        PIL.fromarray(sbs).save(frames_dir / f"frame_{i:03d}.png")

    out_dir = tmp_path / "depthmaps"
    rc = video_main(["imgdir", str(frames_dir), str(D),
                     "-cm", "ssd", "-dm", "wta", "-am", "sgm",
                     "--headless", "--output-dir", str(out_dir),
                     "--max-frames", "2"])
    assert rc == 0
    outputs = sorted(out_dir.glob("depth_*.png"))
    assert len(outputs) == 2
    assert all(p.stat().st_size > 0 for p in outputs)


def test_video_cli_headless_y4m(tmp_path):
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3)
    sbs = np.concatenate([(left * 255).astype(np.uint8),
                          (right * 255).astype(np.uint8)], axis=1)
    native.write_y4m(tmp_path / "v.y4m", np.stack([sbs] * 3))

    out_dir = tmp_path / "depthmaps"
    rc = video_main(["y4m", str(tmp_path / "v.y4m"), str(D),
                     "--headless", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 3
