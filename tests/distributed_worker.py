"""Worker process for the multi-process (DCN-axis) smoke test.

Launched twice by tests/test_distributed.py (or standalone via
``python tests/distributed_worker.py --launch``): each process owns 4
virtual CPU devices, ``jax.distributed`` glues them into one 8-device
runtime, and ``make_hybrid_mesh`` lays out (batch=2 hosts, tile=4) — the
production multi-host video topology (frames data-parallel over DCN, image
rows over the in-host interconnect).

Each process drives the full ShardedPipeline (exact SGM carry hand-off +
DP-capable config surface) on globally-sharded input and checks its own
addressable output shards bit-exactly against the locally recomputed
single-chip reference.
"""

import argparse
import json
import sys


def run_worker(coordinator: str, process_id: int, num_processes: int) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    # Must run before anything that initializes the XLA backend — including
    # importing stereomatch_tpu (whose package import touches jax state).
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    from stereomatch_tpu.parallel.mesh import (BATCH_AXIS, TILE_AXIS,
                                               make_hybrid_mesh)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereomatch_tpu.aggregation import Semiglobal
    from stereomatch_tpu.cost import SSD
    from stereomatch_tpu.disparity_reduce import WinnerTakesAll
    from stereomatch_tpu.parallel import ShardedPipeline

    mesh = make_hybrid_mesh()
    assert mesh.shape[BATCH_AXIS] * mesh.shape[TILE_AXIS] \
        == jax.device_count()

    d = 16
    batch, height, width = 2, 32, 48
    rng = np.random.default_rng(7)          # identical on every process
    left = rng.random((batch, height, width)).astype(np.float32)
    right = rng.random((batch, height, width)).astype(np.float32)

    sharding = NamedSharding(mesh, P(BATCH_AXIS, TILE_AXIS, None))
    gleft = jax.make_array_from_callback(left.shape, sharding,
                                         lambda idx: left[idx])
    gright = jax.make_array_from_callback(right.shape, sharding,
                                          lambda idx: right[idx])

    pipe = ShardedPipeline(mesh, d, kernel_size=3, aggregation="sgm",
                           reducer="wta", sgm_mode="exact", backend="xla")
    out = pipe.estimate(gleft, gright)

    # Single-chip reference, recomputed locally — exact mode must bit-match.
    ref = np.stack([
        np.asarray(WinnerTakesAll()(
            Semiglobal(backend="xla")(SSD(d, kernel_size=3)(left[b], right[b]),
                                      left[b])))
        for b in range(batch)])

    checked = 0
    for shard in out.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref[shard.index])
        checked += 1

    return {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "shards_checked": checked,
        "result_shape": list(out.shape),
    }


def launch(num_processes: int = 2, timeout: float = 600.0):
    """Spawn the workers; returns their parsed result dicts."""
    import os
    import socket
    import subprocess

    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", f"localhost:{port}",
             "--process-id", str(i),
             "--num-processes", str(num_processes)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=repo)
        for i in range(num_processes)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (rc={p.returncode}):\n"
                               f"{stdout}\n{stderr}")
        line = [l for l in stdout.splitlines()
                if l.startswith("DISTRIBUTED_OK ")]
        assert line, f"no result line in worker output:\n{stdout}\n{stderr}"
        outputs.append(json.loads(line[-1][len("DISTRIBUTED_OK "):]))
    return outputs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--launch", action="store_true",
                        help="Spawn 2 workers and write the artifact JSON.")
    parser.add_argument("--coordinator")
    parser.add_argument("--process-id", type=int)
    parser.add_argument("--num-processes", type=int, default=2)
    args = parser.parse_args()

    if args.launch:
        import pathlib
        outputs = launch()
        artifact = pathlib.Path(__file__).parent.parent / "benchmarks" \
            / "distributed_smoke.json"
        artifact.write_text(json.dumps(outputs, indent=2))
        print(f"2-process DCN-axis smoke OK -> {artifact}")
        return 0

    info = run_worker(args.coordinator, args.process_id, args.num_processes)
    print("DISTRIBUTED_OK " + json.dumps(info))
    return 0


if __name__ == "__main__":
    sys.exit(main())
