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


def _write_y4m_stream(tmp_path, n_frames=5):
    from stereomatch_tpu import native
    frames = []
    for i in range(n_frames):
        left, right, _ = synthetic_stereo_pair(32, 48, D, seed=3 + i)
        frames.append(np.concatenate([(left * 255).astype(np.uint8),
                                      (right * 255).astype(np.uint8)],
                                     axis=1))
    path = tmp_path / "v.y4m"
    native.write_y4m(path, np.stack(frames))
    return path


def test_video_cli_batched_y4m(tmp_path):
    """--batch routes through the StreamingEstimator (batched lax.map
    steady state) end to end from the CLI."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2", "-am", "sgm",
                     "--headless", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_mesh_y4m_matches_single_chip(tmp_path):
    """--mesh routes Y4M frames through the sharded (batch, tile) pipeline
    on the 8-device CPU mesh; exact SGM mode must reproduce the per-frame
    single-chip CLI output bit-for-bit (BASELINE config #5 as a CLI run)."""
    from PIL import Image
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import jax
    assert len(jax.devices()) >= 8

    path = _write_y4m_stream(tmp_path)
    mesh_dir = tmp_path / "mesh_out"
    rc = video_main(["y4m", str(path), str(D), "-am", "sgm", "--mesh",
                     "--sgm-mode", "exact", "--backend", "xla",
                     "--headless", "--output-dir", str(mesh_dir)])
    assert rc == 0
    mesh_frames = sorted(mesh_dir.glob("depth_*.png"))
    assert len(mesh_frames) == 5

    ref_dir = tmp_path / "ref_out"
    rc = video_main(["y4m", str(path), str(D), "-am", "sgm",
                     "--backend", "xla",
                     "--headless", "--output-dir", str(ref_dir)])
    assert rc == 0
    for mf, rf in zip(mesh_frames, sorted(ref_dir.glob("depth_*.png"))):
        np.testing.assert_array_equal(np.asarray(Image.open(mf)),
                                      np.asarray(Image.open(rf)))


def test_video_cli_temporal_imgdir(tmp_path):
    """--temporal tracks an image sequence end to end (frame 0 keyframe,
    later frames banded around the previous disparity)."""
    PIL = pytest.importorskip("PIL.Image")
    from stereomatch_tpu.io.synthetic import stereo_sequence
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, (left, right, _) in enumerate(stereo_sequence(32, 48, D, 4,
                                                         seed=3)):
        sbs = np.concatenate([(left * 255).astype(np.uint8),
                              (right * 255).astype(np.uint8)], axis=1)
        PIL.fromarray(sbs).save(frames_dir / f"frame_{i:03d}.png")

    out_dir = tmp_path / "depthmaps"
    rc = video_main(["imgdir", str(frames_dir), str(D), "--temporal",
                     "--keyframe-interval", "3", "--headless",
                     "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 4


def test_video_cli_temporal_rejects_batched():
    rc = video_main(["imgdir", "/nonexistent", str(D), "--temporal",
                     "--batch", "2", "--headless"])
    assert rc == 2


def test_video_cli_batched_pyramid_y4m(tmp_path):
    """--batch --pyramid runs the coarse-to-fine pipeline per frame inside
    the StreamingEstimator's lax.map steady state."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2",
                     "--pyramid", "1", "--backend", "xla",
                     "--headless", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_mesh_pyramid_matches_per_frame(tmp_path):
    """--mesh --pyramid routes frames through the row-sharded pyramid;
    exact SGM hand-off must reproduce the per-frame pyramid CLI output
    bit-for-bit (32x48 frames divide by 2**levels on every tile)."""
    from PIL import Image
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import jax
    assert len(jax.devices()) >= 8

    path = _write_y4m_stream(tmp_path)
    mesh_dir = tmp_path / "mesh_out"
    rc = video_main(["y4m", str(path), str(D), "--mesh", "--pyramid", "1",
                     "--sgm-mode", "exact", "--backend", "xla",
                     "--headless", "--output-dir", str(mesh_dir)])
    assert rc == 0
    mesh_frames = sorted(mesh_dir.glob("depth_*.png"))
    assert len(mesh_frames) == 5

    ref_dir = tmp_path / "ref_out"
    rc = video_main(["y4m", str(path), str(D), "--pyramid", "1",
                     "--backend", "xla",
                     "--headless", "--output-dir", str(ref_dir)])
    assert rc == 0
    for mf, rf in zip(mesh_frames, sorted(ref_dir.glob("depth_*.png"))):
        np.testing.assert_array_equal(np.asarray(Image.open(mf)),
                                      np.asarray(Image.open(rf)))


def test_video_cli_batched_refine_y4m(tmp_path):
    """--batch --refine applies median + sub-pixel inside the batched
    steady state (float maps colorize fine)."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2", "-am", "sgm",
                     "--refine", "--backend", "xla",
                     "--headless", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_mesh_refine_y4m(tmp_path):
    """--mesh --refine routes median/sub-pixel through the sharded
    post-processing stages."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import jax
    assert len(jax.devices()) >= 8
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--mesh", "-am", "sgm",
                     "--refine", "--sgm-mode", "exact", "--backend", "xla",
                     "--headless", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_temporal_mesh_matches_single_chip(tmp_path):
    """--temporal --mesh row-shards the stateful tracker (tile-only mesh)
    and must reproduce the per-frame temporal CLI output bit-for-bit."""
    PIL = pytest.importorskip("PIL.Image")
    from PIL import Image
    import jax
    assert len(jax.devices()) >= 8
    from stereomatch_tpu.io.synthetic import stereo_sequence
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, (left, right, _) in enumerate(stereo_sequence(32, 48, D, 4,
                                                         seed=3)):
        sbs = np.concatenate([(left * 255).astype(np.uint8),
                              (right * 255).astype(np.uint8)], axis=1)
        PIL.fromarray(sbs).save(frames_dir / f"frame_{i:03d}.png")

    mesh_dir = tmp_path / "mesh_out"
    rc = video_main(["imgdir", str(frames_dir), str(D), "--temporal",
                     "--mesh", "--keyframe-interval", "3",
                     "--backend", "xla", "--headless",
                     "--output-dir", str(mesh_dir)])
    assert rc == 0
    mesh_frames = sorted(mesh_dir.glob("depth_*.png"))
    assert len(mesh_frames) == 4

    ref_dir = tmp_path / "ref_out"
    rc = video_main(["imgdir", str(frames_dir), str(D), "--temporal",
                     "--keyframe-interval", "3", "--backend", "xla",
                     "--headless", "--output-dir", str(ref_dir)])
    assert rc == 0
    for mf, rf in zip(mesh_frames, sorted(ref_dir.glob("depth_*.png"))):
        np.testing.assert_array_equal(np.asarray(Image.open(mf)),
                                      np.asarray(Image.open(rf)))


def test_video_cli_speckle_modes(tmp_path):
    """--speckle applies on the per-frame and mesh paths."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    for extra, subdir in ((["--speckle"], "a"),
                          (["--mesh", "--speckle", "--backend", "xla"], "b")):
        out_dir = tmp_path / subdir
        rc = video_main(["y4m", str(path), str(D), "-am", "sgm",
                         *extra, "--headless", "--output-dir", str(out_dir)])
        assert rc == 0
        assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_wmf_batched_y4m(tmp_path):
    """--wmf routes the guide-weighted median through the batched
    estimator (and composes with --refine)."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "wmf_depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2", "-am", "sgm",
                     "--wmf", "--refine", "--headless",
                     "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_wmf_rejects_pyramid(tmp_path):
    rc = video_main(["y4m", "missing.y4m", str(D), "--pyramid", "1",
                     "--wmf", "--headless",
                     "--output-dir", str(tmp_path)])
    assert rc == 2


def test_video_cli_lr_check_batched_y4m(tmp_path):
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "lr_depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2", "-am", "sgm",
                     "--lr-check", "--headless",
                     "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_lr_check_per_frame_y4m(tmp_path):
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "lr_pf_depthmaps"
    rc = video_main(["y4m", str(path), str(D), "-am", "sgm", "--lr-check",
                     "--lr-mode", "mirror", "--headless", "--max-frames",
                     "2", "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 2


def test_video_cli_lr_check_rejects_pyramid(tmp_path):
    rc = video_main(["y4m", "missing.y4m", str(D), "--pyramid", "1",
                     "--lr-check", "--headless",
                     "--output-dir", str(tmp_path)])
    assert rc == 2


def test_video_cli_fgs_batched_y4m(tmp_path):
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "fgs_depthmaps"
    rc = video_main(["y4m", str(path), str(D), "--batch", "2", "-am", "sgm",
                     "--lr-check", "--fgs", "64", "--headless",
                     "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 5


def test_video_cli_pyramid_refine_per_frame(tmp_path):
    """Regression: the per-frame path with --pyramid --refine must route
    only subpixel/median kwargs to PyramidPipeline.estimate_refined
    (review finding: the LR/WMF/FGS kwargs crashed it)."""
    from stereomatch_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path = _write_y4m_stream(tmp_path)
    out_dir = tmp_path / "pyr_refine"
    rc = video_main(["y4m", str(path), str(D), "--pyramid", "1", "--refine",
                     "--headless", "--max-frames", "2",
                     "--output-dir", str(out_dir)])
    assert rc == 0
    assert len(list(out_dir.glob("depth_*.png"))) == 2
