"""Overlap-mode accuracy curve: disparity error vs warm-up window size.

Measures, at the reference benchmark geometry (teddy full-res 375x450,
D=128, 5 row tiles of 75 rows), how the ``overlap`` warm-up length trades
accuracy for the linear scaling of overlap mode:

* mismatch fraction vs the EXACT sharded result (the bit-exact carry
  hand-off mode), and
* bad-pixel(>1) delta vs ground truth on the synthetic scene.

Runs on the CPU mesh — the numbers are about recurrence truncation, not
hardware.  Writes benchmarks/overlap_curve.json and prints a markdown
table for docs/performance.md.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python benchmarks/overlap_curve.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OVERLAPS = (0, 8, 16, 32, 64, 128, 300)
HEIGHT, WIDTH, DISP = 375, 450, 128
N_TILE = 5


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tests"))
    from conftest import synthetic_stereo_pair

    from stereomatch_tpu.parallel import ShardedPipeline, make_mesh

    left, right, gt = synthetic_stereo_pair(HEIGHT, WIDTH, DISP, seed=42)
    mesh = make_mesh(jax.devices()[:N_TILE], n_batch=1, n_tile=N_TILE)

    def run(sgm_mode, overlap=64):
        pipe = ShardedPipeline(mesh, DISP, aggregation="sgm", reducer="wta",
                               sgm_mode=sgm_mode, overlap=overlap,
                               backend="xla")
        return np.asarray(pipe.estimate(left[None], right[None]))[0]

    def bad_pixel(disp):
        return float(np.mean((np.abs(disp - gt) > 1)[:, DISP:]))

    print("computing exact reference...", file=sys.stderr, flush=True)
    exact = run("exact")
    exact_bp = bad_pixel(exact)

    rows = []
    for ov in OVERLAPS:
        disp = run("overlap", ov)
        rows.append({
            "overlap": ov,
            "mismatch_vs_exact": float(np.mean(disp != exact)),
            "bad_pixel": bad_pixel(disp),
            "bad_pixel_delta_vs_exact": bad_pixel(disp) - exact_bp,
        })
        print(f"overlap={ov:4d}  mismatch={rows[-1]['mismatch_vs_exact']:.5f}"
              f"  bad-pixel={rows[-1]['bad_pixel']:.5f}"
              f"  (exact {exact_bp:.5f})", file=sys.stderr, flush=True)

    payload = {"geometry": f"{HEIGHT}x{WIDTH} D={DISP}, {N_TILE} tiles "
                           f"of {HEIGHT // N_TILE} rows",
               "exact_bad_pixel": exact_bp, "rows": rows}
    out = pathlib.Path(__file__).parent / "overlap_curve.json"
    out.write_text(json.dumps(payload, indent=2))

    print("\n| overlap | mismatch vs exact | bad-pixel | delta vs exact |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['overlap']} | {r['mismatch_vs_exact']*100:.2f}% "
              f"| {r['bad_pixel']*100:.2f}% "
              f"| {r['bad_pixel_delta_vs_exact']*100:+.3f}pp |")
    print(f"\nexact-mode bad-pixel: {exact_bp*100:.2f}%  -> {out}")


if __name__ == "__main__":
    main()
