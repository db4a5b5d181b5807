"""The examples must keep running as the API evolves."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_quickstart(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py"),
         "--cpu", "--out-dir", str(tmp_path),
         "--height", "48", "--width", "64", "--max-disparity", "16"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "bad-pixel" in proc.stdout
    for name in ("left.png", "disparity.png", "disparity.pfm", "cloud.ply"):
        assert (tmp_path / name).stat().st_size > 0
