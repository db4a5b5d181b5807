"""Round-4 probe: can HD row passes run full-width after all?

The W-on-grid mode exists because round 2's VMEM accounting
(_fits_full_width: (n_fam + 2 + 6) f32 rows) said full-width HD blocks
break the budget.  That accounting is crude in two ways this probe
tests on the real chip (Mosaic legality/OOM never fails in interpret
mode):

  1. It charges every buffer at f32 width — but bf16 storage halves the
     cost/acc/out blocks (the carry/masks stay f32).
  2. It charges the 2-row mask cache even where _sweep_pass would turn
     mask_scratch OFF anyway (HD rows exceed _MASK_CACHE_MAX_BYTES),
     and double-charges temporaries that the w_chunks mechanism bounds.

If forced full-width compiles and beats wgrid, the fit check should be
rewritten dtype-aware; if it OOMs, the wgrid mode keeps its job and
this file is the evidence.

Usage: python benchmarks/hd_fullwidth_probe_r4.py [--json OUT.json]
"""

import argparse
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
    ap.add_argument("--json",
                    default="benchmarks/hd_fullwidth_probe_r4_out.json")
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    h, w, d = 1024, 1280, 256
    rng = np.random.default_rng(0)
    image = jax.device_put(rng.random((h, w), np.float32))
    results = {}

    def bench(name, fn, init):
        def body(c):
            out = fn(c)
            return c + out[:, :, :1].astype(c.dtype) * jnp.asarray(
                1e-12, jnp.float32).astype(c.dtype)
        try:
            ms = marginal_ms(body, init, args.chain, args.repeats)
        except Exception as e:
            results[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            print(f"{name:34s} FAILED {str(e)[:160]}")
            return
        results[name] = round(ms, 3)
        print(f"{name:34s} {ms:9.2f} ms")

    shifts = sgm_pallas._FAMILY_SHIFTS
    real_fits = sgm_pallas._fits_full_width

    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        cost = jax.device_put(
            rng.random((h, w, d), np.float32).astype(dtype))
        p2f = jax.device_put(np.asarray(sgm_pallas._p2_maps(
            image, 0.1, 0.2, shifts, reverse=False)))

        # Current behavior (wgrid at this geometry).
        bench(f"rowpass_fwd_wgrid_{tag}",
              lambda c: sgm_pallas._sweep_pass(
                  c, p2f, None, families=shifts, penalty1=0.1,
                  reverse=False),
              cost)

        # Forced full-width.
        sgm_pallas._fits_full_width = lambda *a: True
        try:
            bench(f"rowpass_fwd_fullwidth_{tag}",
                  lambda c: sgm_pallas._sweep_pass(
                      c, p2f, None, families=shifts, penalty1=0.1,
                      reverse=False),
                  cost)
        finally:
            sgm_pallas._fits_full_width = real_fits

        # Whole-aggregation baseline for context.
        bench(f"sgm_full_{tag}",
              lambda c: sgm_pallas.semiglobal_aggregate_pallas(c, image),
              cost)

    out = {"geometry": f"{w}x{h} d={d}",
           "device": str(jax.devices()[0].device_kind),
           "results": results}
    pathlib.Path(args.json).write_text(json.dumps(out, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
