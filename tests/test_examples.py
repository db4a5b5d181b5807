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


def test_serving_client_demo_roundtrip():
    """examples/serving_client.py --demo against an in-process server."""
    import threading

    from stereomatch_tpu.cli.serve import build_parser, make_server

    srv = make_server(build_parser().parse_args(
        ["32", "--port", "0", "--backend", "xla"]))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "serving_client",
            pathlib.Path(__file__).parent.parent
            / "examples" / "serving_client.py")
        client = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(client)

        import numpy as np
        from stereomatch_tpu.io.synthetic import stereo_pair
        left, right, gt = stereo_pair(48, 64, 16, seed=7)
        disp = client.estimate(
            f"http://127.0.0.1:{srv.server_port}",
            (left * 255).astype(np.uint8), (right * 255).astype(np.uint8))
        assert disp.shape == left.shape
        bad = np.mean(np.abs(disp.astype(np.float32) - gt) > 1)
        assert bad < 0.2
    finally:
        srv.shutdown()
        srv.server_close()
