"""A/B: frame-pipelined vs naive exact-SGM carry hand-off (CPU mesh).

VERDICT r3 next #6: the exact mode's serial carry chain should hide
behind the batch axis.  Round 4 rewrote ``_handoff_sweep`` as a
(frame, tile) wavefront — T + B - 1 stages of one frame each instead of
T stages of all B frames — which is bit-equal per frame and ~min(T, B)x
less compute.  This script measures both schedules wall-clock on the
8-device virtual CPU mesh (4 row tiles x 2 batch) and asserts equality.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/exact_pipeline_ab_r4.py [--json OUT.json]
"""

import argparse
import functools
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax                                                   # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                      # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P   # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json",
                    default="benchmarks/exact_pipeline_ab_r4_out.json")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--disp", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from jax.experimental.shard_map import shard_map
    from stereomatch_tpu.parallel import make_mesh
    from stereomatch_tpu.parallel.mesh import BATCH_AXIS, TILE_AXIS
    from stereomatch_tpu.parallel import sharded

    mesh = make_mesh(jax.devices()[:8], n_batch=2)   # 4 row tiles
    n_tiles = mesh.shape[TILE_AXIS]
    sharding = NamedSharding(mesh, P(BATCH_AXIS, TILE_AXIS, None, None))
    img_sh = NamedSharding(mesh, P(BATCH_AXIS, TILE_AXIS, None))

    def build(fn_name):
        sweep = getattr(sharded, fn_name)

        def local(vol, img):
            out = sweep(vol, img, 0.1, 0.2, 0, axis_name=TILE_AXIS,
                        n_tiles=n_tiles, reverse=False)
            out = out + sweep(vol, img, 0.1, 0.2, 0, axis_name=TILE_AXIS,
                              n_tiles=n_tiles, reverse=True)
            out = out + sweep(vol, img, 0.1, 0.2, 1, axis_name=TILE_AXIS,
                              n_tiles=n_tiles, reverse=False)
            return out

        return jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(BATCH_AXIS, TILE_AXIS, None, None),
                      P(BATCH_AXIS, TILE_AXIS, None)),
            out_specs=P(BATCH_AXIS, TILE_AXIS, None, None)))

    rng = np.random.default_rng(0)
    results = {}
    ref = {}
    for batch in (2, 4, 8, 16):
        vol = jax.device_put(
            rng.random((batch, args.height, args.width, args.disp),
                       np.float32), sharding)
        img = jax.device_put(
            rng.random((batch, args.height, args.width), np.float32),
            img_sh)
        for name, fn_name in (("pipelined", "_handoff_sweep"),
                              ("naive", "_handoff_sweep_naive")):
            fn = build(fn_name)
            out = np.asarray(fn(vol, img))           # compile + value
            key = f"batch{batch}"
            if key in ref:
                np.testing.assert_array_equal(out, ref[key])
            else:
                ref[key] = out
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(vol, img)[0, 0, 0, 0].block_until_ready()
                best = min(best, time.perf_counter() - t0)
            results[f"{name}_batch{batch}_ms"] = round(best * 1e3, 2)
            print(f"{name:10s} batch={batch:3d}  {best * 1e3:8.2f} ms  "
                  f"({best * 1e3 / batch:.2f} ms/frame)")

    for batch in (4, 8, 16):
        sp = results[f"naive_batch{batch}_ms"] / \
            results[f"pipelined_batch{batch}_ms"]
        results[f"speedup_batch{batch}"] = round(sp, 2)
        print(f"speedup at batch {batch}: {sp:.2f}x")
    assert results["speedup_batch4"] > 1.2, results
    pathlib.Path(args.json).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
