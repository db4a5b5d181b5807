"""The real-data runbook (`just real-eval`), exercised two ways:

1. offline, always: a synthetic scene written in the Middlebury-2003
   on-disk layout (im2.ppm / im6.ppm / disp2.pgm, disparity * 4, 0 =
   unknown) drives the same MiddleburyDataset -> stm-eval chain the
   runbook uses — the full plumbing minus the network;
2. on real data, when present: if ``data/middlebury2003`` exists (the
   user ran ``stm-fetch teddy2003``/``cones2003`` with network), the
   evaluation runs on it and the bad-pixel rates must land inside the
   ranges pre-registered in README.md from the synthetic suite.
"""

import json
from pathlib import Path

import numpy as np
import pytest

REAL_DATA = Path(__file__).parent.parent / "data" / "middlebury2003"

# Pre-registered acceptance ranges for Middlebury 2003 teddy/cones at
# bad-threshold 2.0 with census:wta:sgm (README "Real-data runbook").
# Lower bound guards against a degenerate GT read (all-unknown masks
# score 0); upper bound is ~2x published SGM-class error on these scenes.
REAL_BAD2_RANGE = (0.005, 0.30)


def _write_2003_scene(scene_dir, seed=4):
    from stereomatch_tpu import native
    from stereomatch_tpu.io.synthetic import stereo_pair

    left, right, gt = stereo_pair(48, 96, 16, seed)
    scene_dir.mkdir(parents=True)
    native.write_pnm(scene_dir / "im2.ppm",
                     np.repeat((left * 255).astype(np.uint8)[..., None],
                               3, axis=2))
    native.write_pnm(scene_dir / "im6.ppm",
                     np.repeat((right * 255).astype(np.uint8)[..., None],
                               3, axis=2))
    pgm = np.clip(gt * 4, 0, 255).astype(np.uint8)      # disparity * 4
    native.write_pnm(scene_dir / "disp2.pgm", pgm)
    native.write_pnm(scene_dir / "disp6.pgm", pgm)
    return gt


def test_2003_layout_dataset(tmp_path):
    from stereomatch_tpu.io.data import MiddleburyDataset

    gt = _write_2003_scene(tmp_path / "teddy")
    ds = MiddleburyDataset(tmp_path)
    assert len(ds) == 1
    item = ds[0]
    assert item["stereo_name"] == "teddy"
    assert item["max_disparity"] == 64                  # published ndisp
    assert item["left"].shape == (48, 96, 3)            # RGB, like 2021
    # /4 unscaling round-trips the synthetic integer ground truth.
    np.testing.assert_allclose(item["gt_disparity"], gt, atol=0.25)


def test_runbook_chain_offline(tmp_path):
    """stm-eval over a 2003-layout tree end to end (markdown + JSON)."""
    from stereomatch_tpu.cli import evaluate

    _write_2003_scene(tmp_path / "teddy")
    out = tmp_path / "rows.json"
    rc = evaluate.main([str(tmp_path), "--configs", "census:wta:sgm",
                        "--max-disparity", "16",
                        "--json", str(out)])
    assert rc == 0
    rows = json.loads(out.read_text())
    (config_row,) = rows
    (scene_row,) = [s for s in config_row["scenes"]
                    if s["scene"] == "teddy"]
    assert 0.0 <= scene_row["bad_pixel_ratio"] < 0.25


@pytest.mark.skipif(not REAL_DATA.is_dir(),
                    reason="no real Middlebury data (run `just real-eval` "
                           "with network: stm-fetch teddy2003/cones2003)")
def test_runbook_real_middlebury(tmp_path):
    """The actual north-star number: bad-pixel vs real teddy/cones GT
    inside the pre-registered range."""
    from stereomatch_tpu.cli import evaluate

    out = tmp_path / "rows.json"
    rc = evaluate.main([str(REAL_DATA), "--configs", "census:wta:sgm",
                        "--json", str(out)])
    assert rc == 0
    rows = json.loads(out.read_text())
    assert rows and rows[0]["scenes"], \
        "no scenes found under data/middlebury2003"
    lo, hi = REAL_BAD2_RANGE
    for scene_row in rows[0]["scenes"]:
        assert lo <= scene_row["bad_pixel_ratio"] <= hi, scene_row
