#!/usr/bin/env python
"""Round-5 A/B: exact-SGM hand-off schedule (wavefront vs naive vs auto).

VERDICT r4 weak #7: the (frame, tile) wavefront loses to the naive
hand-off at batch 2 (29.23 vs 27.44 ms, exact_pipeline_ab_r4) yet
round 4 always took the wavefront.  Round 5 adds
ici_model.select_exact_schedule (vmap-efficiency cost model fitted to
that measurement) and ``sgm_schedule="auto"``.  This script drives the
FULL sharded pipeline on the 8-device CPU mesh at local batches
1/2/4/8 under all three settings; done-criterion: auto is never slower
than either fixed schedule beyond noise.

    python benchmarks/exact_schedule_ab_r5.py [--json OUT.json]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json",
                    default="benchmarks/exact_schedule_ab_r5_out.json")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--disp", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from stereomatch_tpu.parallel import ShardedPipeline, make_mesh
    from stereomatch_tpu.parallel.ici_model import select_exact_schedule

    mesh = make_mesh(jax.devices()[:8], n_batch=2)   # 4 row tiles
    rng = np.random.default_rng(0)
    results = {"schedules": ["wavefront", "naive", "auto"],
               "mesh": "2 batch x 4 tile", "reps": args.reps}
    ok = True
    for local_batch in (1, 2, 4, 8):
        g_batch = 2 * local_batch
        left = rng.random((g_batch, args.height, args.width),
                          np.float32).astype(np.float32)
        right = np.roll(left, 3, axis=2)
        row = {}
        outs = {}
        for sched in ("wavefront", "naive", "auto"):
            pipe = ShardedPipeline(mesh, args.disp, cost="census",
                                   kernel_size=1, aggregation="sgm",
                                   reducer="wta", sgm_mode="exact",
                                   sgm_schedule=sched, backend="xla")
            out = np.asarray(pipe.estimate(left, right))     # compile
            outs[sched] = out
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(pipe.estimate(left, right))
                best = min(best, time.perf_counter() - t0)
            row[sched] = round(best * 1e3, 2)
        assert np.array_equal(outs["wavefront"], outs["naive"]), \
            "schedules disagree!"
        assert np.array_equal(outs["auto"], outs["naive"])
        pick, info = select_exact_schedule(tiles=4, batch=local_batch)
        row["auto_resolved_to"] = pick
        row["model"] = info
        floor = min(row["wavefront"], row["naive"])
        row["auto_overhead_pct"] = round(
            (row["auto"] / floor - 1) * 100, 1)
        if row["auto"] > 1.10 * floor:
            ok = False
        results[f"local_batch_{local_batch}"] = row
        print(f"B_loc={local_batch}: {row}", flush=True)
    results["auto_never_slower_within_10pct"] = ok
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": ok}))


if __name__ == "__main__":
    main()
