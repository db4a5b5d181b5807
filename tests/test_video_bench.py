"""The end-to-end video benchmark must keep running as the API evolves."""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_video_benchmark_cpu_smoke(tmp_path):
    out = tmp_path / "video.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "video.py"),
         "--force-cpu", "--frames", "5", "--batches", "1,2",
         "--height", "32", "--width", "64", "--max-disparity", "8",
         "--json", str(out)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(out.read_text())
    for key in ("batch1", "batch2"):
        res = payload["results"][key]
        assert res["frames"] == 5
        assert res["fps"] > 0
