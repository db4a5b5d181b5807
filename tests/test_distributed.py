"""Multi-process (DCN-axis) execution proof.

The reference is single-process/single-GPU (SURVEY.md §2: "no multi-node
anything"); the hybrid (batch over hosts, tile in-host) mesh is this
build's new axis.  This test actually runs it: two OS processes, 4 virtual
CPU devices each, glued by ``jax.distributed`` — ``make_hybrid_mesh`` +
``ShardedPipeline`` execute with ``jax.process_count() == 2`` and every
process's output shards bit-match the single-chip reference.

Runnable standalone (writes benchmarks/distributed_smoke.json):
    python tests/distributed_worker.py --launch
"""

import json
import os
import socket
import subprocess
import sys

from .distributed_worker import launch


def test_two_process_hybrid_mesh_pipeline():
    outputs = launch(num_processes=2)
    assert len(outputs) == 2
    for info in outputs:
        assert info["process_count"] == 2
        assert info["global_devices"] == 8
        assert info["local_devices"] == 4
        assert info["mesh"] == {"batch": 2, "tile": 4}
        assert info["shards_checked"] > 0
    assert {o["process_id"] for o in outputs} == {0, 1}


def test_two_process_scaling_benchmark(tmp_path):
    """benchmarks/scaling.py --distributed actually executes with
    process_count == 2 and reports the full hybrid-mesh data point."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "benchmarks", "scaling.py"),
             "--force-cpu", "--distributed",
             "--coordinator", f"localhost:{port}",
             "--process-id", str(i), "--num-processes", "2",
             "--height", "32", "--width", "48", "--disp", "16",
             "--frames-per-chip", "1", "--reps", "1",
             "--json", str(tmp_path / f"scaling_{i}.json")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=repo)
        for i in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"{stdout}\n{stderr}"
    payload = json.loads((tmp_path / "scaling_0.json").read_text())
    row = payload["rows"][0]
    assert row["devices"] == 8
    assert row["mesh"] == {"batch": 2, "tile": 4}
    assert row["fps"] > 0
