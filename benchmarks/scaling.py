"""Multi-chip scaling-efficiency benchmark for the sharded pipeline.

Measures frames/s of the (batch, tile) mesh pipeline at increasing device
counts on whatever devices the process can see, reporting per-chip
throughput and scaling efficiency vs the single-device run — the
1 chip -> 1 host -> N hosts curve BASELINE.json asks for.  On a multi-host
pod, launch one process per host with ``--distributed``.

On this repo's single-chip dev box it degenerates to n=1 (the mesh logic
itself is validated on the 8-device virtual CPU mesh: --force-cpu).

Usage:
    python benchmarks/scaling.py [--force-cpu] [--distributed]
        [--height 384] [--width 448] [--disp 128] [--frames-per-chip 2]
        [--sgm-mode overlap|exact]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(mesh, args):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereomatch_tpu.parallel import make_sharded_estimate
    from stereomatch_tpu.parallel.mesh import BATCH_AXIS, TILE_AXIS

    n_batch = mesh.shape[BATCH_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    n_dev = n_batch * n_tile

    height = args.height - (args.height % n_tile)
    batch = args.frames_per_chip * n_batch
    fn = make_sharded_estimate(
        mesh, max_disparity=args.disp, aggregation="sgm", reducer="wta",
        sgm_mode=args.sgm_mode, overlap=args.overlap,
        backend="xla" if args.force_cpu else "auto")

    rng = np.random.default_rng(0)
    left = rng.random((batch, height, args.width), np.float32)
    right = rng.random((batch, height, args.width), np.float32)
    # Globally-sharded inputs: required under multi-process execution,
    # harmless (and copy-free per shard) single-process.
    sharding = NamedSharding(mesh, P(BATCH_AXIS, TILE_AXIS, None))
    gleft = jax.make_array_from_callback(left.shape, sharding,
                                         lambda idx: left[idx])
    gright = jax.make_array_from_callback(right.shape, sharding,
                                          lambda idx: right[idx])

    jax.block_until_ready(fn(gleft, gright))     # compile
    reps = max(args.reps, 1)
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        jax.block_until_ready(fn(gleft, gright))
        best = min(best, time.perf_counter() - start)
    fps = batch / best
    return {"devices": n_dev, "mesh": dict(mesh.shape), "batch": batch,
            "image": [height, args.width], "fps": round(fps, 2),
            "fps_per_chip": round(fps / n_dev, 2)}


def ici_traffic_model(*, height, width, disp, tiles, kernel=7, overlap=48,
                      cvf_radius=8, itemsize=4, ici_gbps=45.0,
                      hbm_gbps=675.0, hop_latency_us=5.0):
    """Analytic ICI traffic per frame for every sharded config.

    Real N-chip hardware does not exist on this dev box, so scaling
    efficiency is *predicted* from first principles: count the bytes each
    config moves over ICI per frame (halos, carries, reduction combines —
    formulas read off the shard_map bodies in parallel/), compare them
    with the per-chip HBM bytes of the compute itself, and model
    efficiency as hbm_time / (hbm_time + ici_time + serialization).
    ``ici_gbps`` defaults to a deliberately conservative per-link v5e
    figure; pass the measured value on real pods.

    Returns a list of per-config dicts; quoted in docs/architecture.md.
    """
    T = tiles
    vol = height * width * disp * itemsize          # one full volume
    hl = height // T
    rows = []

    def add(name, ici_bytes, serial_stages, compute_scale=1.0, note=""):
        # Per-chip compute: the full pipeline moves ~16 volume-sized HBM
        # transfers (cost ~5, SGM ~10, WTA ~1); each chip owns 1/T of it.
        hbm_bytes = 16 * vol * compute_scale / T
        hbm_ms = hbm_bytes / 1e9 / hbm_gbps * 1e3
        ici_ms = (ici_bytes / 1e9 / ici_gbps * 1e3
                  + serial_stages * hop_latency_us / 1e3)
        rows.append({
            "config": name, "tiles": T,
            "ici_bytes_per_frame": int(ici_bytes),
            "ici_vs_volume": round(ici_bytes / vol, 4),
            "serial_stages": serial_stages,
            "hbm_bytes_per_chip": int(hbm_bytes),
            "ici_ms": round(ici_ms, 4), "hbm_ms": round(hbm_ms, 4),
            "predicted_efficiency": round(hbm_ms / (hbm_ms + ici_ms), 3),
            "note": note,
        })

    b = T - 1                                        # tile boundaries
    img_halo = 2 * 2 * kernel * width * 4 * b        # 2 images x 2 dirs

    # Row-sharded SGM, exact carry hand-off (parallel/sharded.py:452-505):
    # 3-family [3, W, D] carry per boundary, forward + reverse, f32 over
    # ICI regardless of storage dtype; the hand-off serializes 2T stages.
    add("sgm_exact",
        img_halo + 2 * b * 3 * width * disp * 4,
        serial_stages=2 * T,
        note="carry [3,W,D] fwd+rev per boundary; chain serializes")

    # Row-sharded SGM, overlap mode (sharded.py:218-320): image halos of
    # (overlap + kernel) rows, no carries, no serialization; each tile
    # computes 2*overlap redundant rows.
    add("sgm_overlap",
        2 * 2 * (overlap + kernel) * width * 4 * b,
        serial_stages=1,
        compute_scale=(hl + 2 * overlap) / hl,
        note=f"redundant compute x{(hl + 2 * overlap) / hl:.2f}")

    # 2-D tiling (tiled2d.py): row halos + column halos; the LR volume
    # re-index ships a D-column volume slab along the W axis.
    tw = max(int(T ** 0.5), 1)
    th = max(T // tw, 1)
    add("tiled2d_lr_volume",
        2 * 2 * (overlap + kernel) * width * 4 * (th - 1)
        + 2 * 2 * (overlap + kernel) * (height // th) * 4 * (tw - 1)
        + (disp * (height // th) * disp * itemsize) * (tw - 1),
        serial_stages=2,
        note="row+col halos + D-column LR volume slab per W boundary")

    # Disparity-block WTA (sharded.py make_disp_sharded_wta): per-pixel
    # (min, argmin) ring combine over the D shards.
    add("disp_sharded_wta",
        2 * b / max(T, 1) * height * width * 8 * T,
        serial_stages=1,
        note="per-pixel (val,idx) all-reduce")

    # CVF row-sharded (sharded.py:118-175): 2*radius volume+guide halo
    # rows per boundary, both directions.
    add("cvf",
        2 * 2 * cvf_radius * width * (disp * itemsize + 4) * b,
        serial_stages=1,
        note="volume+guide halos of 2r rows")

    # FGS (sharded.py:613-670): cross-rank Thomas hand-off — per
    # iteration, forward c'/d' rows and backward u0 row per boundary,
    # 3 iterations x row+column solves.
    add("fgs",
        3 * 2 * (2 + 1) * width * 4 * b,
        serial_stages=3 * 2 * T,
        note="tridiagonal c',d' fwd + u0 bwd per boundary, 3 iters")

    # Temporal band tracking (temporal_sharded.py): census-code halo rows
    # for the band window + the poor-fraction psum (scalar pair).
    add("temporal_band",
        2 * 2 * ((5 // 2) + 1) * width * 4 * b + 8 * T,
        serial_stages=1,
        note="code halos + scalar psum")

    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--force-cpu", action="store_true",
                        help="8-device virtual CPU mesh (logic validation).")
    parser.add_argument("--distributed", action="store_true",
                        help="Multi-host: call jax.distributed.initialize.")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator host:port for --distributed "
                             "(default: cluster auto-detection).")
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=448)
    parser.add_argument("--disp", type=int, default=128)
    parser.add_argument("--frames-per-chip", type=int, default=2)
    parser.add_argument("--sgm-mode", default="overlap",
                        choices=["overlap", "exact"])
    parser.add_argument("--overlap", type=int, default=48)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--json", default=None)
    parser.add_argument("--model", action="store_true",
                        help="emit the analytic ICI traffic model table "
                             "(no devices needed) and exit")
    parser.add_argument("--model-tiles", type=int, default=8)
    parser.add_argument("--ici-gbps", type=float, default=45.0)
    parser.add_argument("--hbm-gbps", type=float, default=675.0)
    args = parser.parse_args()

    if args.model:
        rows = ici_traffic_model(height=args.height, width=args.width,
                                 disp=args.disp, tiles=args.model_tiles,
                                 overlap=args.overlap,
                                 ici_gbps=args.ici_gbps,
                                 hbm_gbps=args.hbm_gbps)
        for r in rows:
            print(f"{r['config']:20s} ici={r['ici_bytes_per_frame']/1e6:8.2f} MB/frame "
                  f"({r['ici_vs_volume']:.3f} vol) stages={r['serial_stages']:3d} "
                  f"eff={r['predicted_efficiency']:.3f}  {r['note']}",
                  file=sys.stderr)
        payload = {"model": True,
                   "params": {"height": args.height, "width": args.width,
                              "disp": args.disp, "tiles": args.model_tiles,
                              "ici_gbps": args.ici_gbps,
                              "hbm_gbps": args.hbm_gbps},
                   "rows": rows}
        if args.json:
            with open(args.json, "w") as f:
                json.dump(payload, f, indent=2)
        print(json.dumps(payload))
        return

    import os
    if args.force_cpu and ("--xla_force_host_platform_device_count"
                           not in os.environ.get("XLA_FLAGS", "")):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        # Directly (not via stereomatch_tpu.parallel): importing the
        # package initializes the XLA backend, after which distributed
        # init is rejected.
        kwargs = {}
        if args.coordinator:
            kwargs = dict(coordinator_address=args.coordinator,
                          process_id=args.process_id,
                          num_processes=args.num_processes)
        jax.distributed.initialize(**kwargs)

    from stereomatch_tpu.parallel import make_mesh
    from stereomatch_tpu.parallel.mesh import make_hybrid_mesh

    devices = jax.devices()
    rows = []
    if jax.process_count() > 1:
        # Multi-process SPMD: every process must join every computation,
        # so measure only the full hybrid mesh (frames over hosts, rows
        # in-host) — the DCN-axis data point BASELINE.json asks for.
        rows.append(measure(make_hybrid_mesh(), args))
    else:
        n = 1
        while n <= len(devices):
            mesh = make_mesh(devices[:n])
            rows.append(measure(mesh, args))
            n *= 2
    base = rows[0]["fps_per_chip"]
    for row in rows:
        row["scaling_efficiency"] = round(row["fps_per_chip"] / base, 3)
        print(f"devices={row['devices']:3d} mesh={row['mesh']} "
              f"fps={row['fps']:9.2f} /chip={row['fps_per_chip']:8.2f} "
              f"eff={row['scaling_efficiency']:.2f}", file=sys.stderr)

    payload = {"device_kind": devices[0].device_kind, "rows": rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
