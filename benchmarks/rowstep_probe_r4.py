"""Round-4 probe: row-pass block-size sensitivity + SGM floor audit.

The r3 artifacts put the two 3-family row passes at 1.86 ms of teddy
SGM's 2.74, against a floor of ~0.92 ms VPU (vpu_probe:
sgm_row_pass_floor_ms_teddy x 2) + ~0.53 ms traffic (5 volume
transfers).  This probe asks where the remaining ~0.4 ms sits: grid/DMA
overhead per step (fewer, larger row blocks would shrink it) or
something block-size-independent.

Usage: python benchmarks/rowstep_probe_r4.py [--json OUT.json]
"""

import argparse
import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from stereomatch_tpu.utils.benchmarking import marginal_ms
from stereomatch_tpu.ops import sgm_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/rowstep_probe_r4_out.json")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    h, w, d = 375, 450, 128
    cost = jax.device_put(rng.random((h, w, d), np.float32))
    image = jax.device_put(rng.random((h, w), np.float32))

    results = {"default_rows_per_step":
               sgm_pallas._pick_rows_per_step(h + 1, w, d, 3)}
    print("default rows_per_step:", results["default_rows_per_step"])

    def bench(name, fn, init):
        def body(c):
            out = fn(c)
            return c + jnp.float32(1e-12) * out[:, :, :1]
        try:
            ms = marginal_ms(body, init, args.chain, args.repeats)
        except Exception as e:
            results[name] = f"failed: {type(e).__name__}"
            print(f"{name:26s} failed: {str(e)[:120]}")
            return
        results[name] = round(ms, 4)
        print(f"{name:26s} {ms:8.3f} ms")

    # Full aggregation baseline (same process).
    bench("sgm_full_SHIPPED",
          lambda c: sgm_pallas.semiglobal_aggregate_pallas(c, image),
          cost)

    # One forward 3-family row pass at forced block sizes.
    groups = sgm_pallas._family_groups(w, d)
    shifts = groups[0]
    cost_v, image_v, _ = sgm_pallas._maybe_pad_rows(cost, image,
                                                    len(shifts))
    # Pad H to 384 (divisible by every probed block size) — timing only.
    cv = np.asarray(cost_v)
    p2 = np.asarray(sgm_pallas._p2_maps(image_v, 0.1, 0.2, shifts,
                                        reverse=False))
    pad = 384 - cv.shape[0]
    cost_v = jax.device_put(np.pad(cv, ((0, pad), (0, 0), (0, 0))))
    p2f = jax.device_put(np.pad(p2, ((0, pad), (0, 0), (0, 0))))

    real_pick = sgm_pallas._pick_rows_per_step
    for rps in (2, 4, 8, 12, 16):
        sgm_pallas._pick_rows_per_step = lambda *a, rps=rps: rps
        try:
            bench(f"rowpass_fwd_rps{rps}",
                  lambda c: sgm_pallas._sweep_pass(
                      c, p2f, None, families=shifts, penalty1=0.1,
                      reverse=False),
                  cost_v)
        finally:
            sgm_pallas._pick_rows_per_step = real_pick

    out = {"geometry": f"{w}x{h} d={d}",
           "device": str(jax.devices()[0].device_kind),
           "results": results}
    pathlib.Path(args.json).write_text(json.dumps(out, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
