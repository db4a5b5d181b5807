"""VPU / memory microbenchmarks behind the SGM optimization decisions.

Two question groups, both answered on the real chip:

1. **Where do SGM's cycles go?**  Inside a Pallas kernel, measure the
   marginal cost of each primitive the band recurrence uses — elementwise
   min/add (f32 and bf16, to test whether bf16 compute doubles VPU rate),
   lane rolls, sublane rolls, the lane-axis min reduction — plus the
   complete per-family band step itself.  The per-step number multiplied
   by families x rows is the true VPU floor for a sweep pass, replacing
   the hand-counted cycle estimate in docs/performance.md.

2. **What is the real copy roofline?**  The round-2 suite reported WTA at
   115% of "roofline" because the single jnp.roll bandwidth probe
   underestimates achievable bandwidth.  This probe takes the max over
   several independent probes (XLA roll-copy, a Pallas streaming copy,
   an XLA read-only reduce) — no op can beat a *max* over copy bounds.

Methodology: marginal cost between two in-kernel repeat counts, measured
with the chain methodology (utils/benchmarking.py), so both the per-call
dispatch constant AND the per-kernel-launch constant cancel:

    us_per_rep = (ms(reps=R2) - ms(reps=R1)) / (R2 - R1) * 1e3

Usage: python benchmarks/vpu_probe.py [--json OUT.json]
"""

import argparse
import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stereomatch_tpu.utils.benchmarking import marginal_ms

    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--chain", type=int, default=8)
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args()

    W, D = 448, 128        # one SGM row at teddy-like width, f32-tile aligned
    results = {
        "device": jax.devices()[0].device_kind,
        "shape": [W, D],
        "methodology": "marginal us/rep between reps=32 and reps=160, "
                       "chain methodology on top",
    }

    def probe_runner(body, reps, dtype, shape):
        """jit(fn(x)) running ``reps`` iterations of ``body(i, y, aux...)``
        over a VMEM-resident buffer inside one Pallas kernel."""

        def kernel(x_ref, c_ref, m0_ref, m1_ref, o_ref):
            aux = (c_ref[:], m0_ref[:], m1_ref[:])

            def it(i, y):
                return body(i, y, *aux)

            o_ref[:] = lax.fori_loop(0, reps, it, x_ref[:])

        @jax.jit
        def run(x, c, m0, m1):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, c, m0, m1)

        return run

    rng = np.random.default_rng(0)

    def op_us(name, body, dtype=jnp.float32, r1=64, r2=4160,
              shape=(W, D), mask_axis=1):
        # The rep diff must be large enough that the total extra compute
        # (2*chain_k * (r2-r1) * per_rep) clears the relay's ms-scale
        # timing jitter: 4096 extra reps x 16 extra calls x ~0.1-1 us/rep
        # = 7-70 ms of signal.
        x = jnp.asarray(rng.random(shape) + 0.5, dtype)
        c = jnp.asarray(rng.random(shape) + 0.5, dtype)
        # SGM's band-edge masks: P1 everywhere, +inf at one d slot.
        m0 = np.full(shape, 0.1, np.float32)
        m1 = np.full(shape, 0.1, np.float32)
        if mask_axis == 1:
            m0[:, 0] = np.inf
            m1[:, -1] = np.inf
        else:
            m0[0, :] = np.inf
            m1[-1, :] = np.inf
        m0 = jnp.asarray(m0, dtype)
        m1 = jnp.asarray(m1, dtype)

        def bench(reps):
            run = probe_runner(body, reps, dtype, shape)

            def chain_body(carry):
                y, c_, a_, b_ = carry
                return (run(y, c_, a_, b_), c_, a_, b_)

            return marginal_ms(chain_body, (x, c, m0, m1),
                               chain_k=args.chain, repeats=args.repeats)

        ms1, ms2 = bench(r1), bench(r2)
        us = (ms2 - ms1) / (r2 - r1) * 1e3
        results[name] = round(us, 4)
        print(f"{name:28s} {us:9.4f} us/rep", file=sys.stderr, flush=True)
        return us

    # --- elementwise throughput: 1 add + 1 min per rep ---
    def minadd(i, y, c, m0, m1):
        t = (jnp.float32(1e-6) * i).astype(y.dtype)
        return jnp.minimum(y + t, c)

    op_us("ew_minadd_f32", minadd)
    try:
        op_us("ew_minadd_bf16", minadd, dtype=jnp.bfloat16)
    except Exception as e:                                  # noqa: BLE001
        results["ew_minadd_bf16"] = f"unsupported: {type(e).__name__}"

    # --- rolls ---
    def roll_lane(i, y, c, m0, m1):
        return pltpu.roll(y, 1, axis=1) + (jnp.float32(1e-6) * i)

    def roll_sub(i, y, c, m0, m1):
        return pltpu.roll(y, 1, axis=0) + (jnp.float32(1e-6) * i)

    op_us("roll_lane_add_f32", roll_lane)
    op_us("roll_sublane_add_f32", roll_sub)

    # --- lane-axis min reduce (the band normalization) ---
    def reduce_sub(i, y, c, m0, m1):
        return y - jnp.min(y, axis=1, keepdims=True) + (jnp.float32(1e-6) * i)

    op_us("reduce_min_sub_f32", reduce_sub)

    # --- the full per-family band step, vertical (no W roll) ---
    def band_step(i, y, c, m0, m1):
        pm = jnp.min(y, axis=1, keepdims=True)
        yn = y - pm
        up = pltpu.roll(yn, 1, axis=1) + m0
        dn = pltpu.roll(yn, D - 1, axis=1) + m1
        band = jnp.minimum(jnp.minimum(yn, up),
                           jnp.minimum(dn, jnp.float32(0.2)))
        return c + band + (jnp.float32(1e-7) * i)

    op_us("band_step_vertical_f32", band_step)

    # --- the diagonal family adds one sublane roll ---
    def band_step_diag(i, y, c, m0, m1):
        y = pltpu.roll(y, 1, axis=0)
        return band_step(i, y, c, m0, m1)

    op_us("band_step_diagonal_f32", band_step_diag)

    # --- [D, W] layout variants: d on sublanes, w on lanes — the d+-1
    # band shifts become sublane rolls (cheap) and the W diagonal shift
    # becomes a lane roll; the min reduce runs over sublanes. ---
    def band_step_dw(i, y, c, m0, m1):
        pm = jnp.min(y, axis=0, keepdims=True)
        yn = y - pm
        up = pltpu.roll(yn, 1, axis=0) + m0
        dn = pltpu.roll(yn, D - 1, axis=0) + m1
        band = jnp.minimum(jnp.minimum(yn, up),
                           jnp.minimum(dn, jnp.float32(0.2)))
        return c + band + (jnp.float32(1e-7) * i)

    def band_step_dw_diag(i, y, c, m0, m1):
        y = pltpu.roll(y, 1, axis=1)
        return band_step_dw(i, y, c, m0, m1)

    op_us("band_step_dw_vertical_f32", band_step_dw, shape=(D, W),
          mask_axis=0)
    op_us("band_step_dw_diagonal_f32", band_step_dw_diag, shape=(D, W),
          mask_axis=0)

    v = results.get("band_step_dw_vertical_f32")
    dg = results.get("band_step_dw_diagonal_f32")
    if isinstance(v, float) and isinstance(dg, float):
        results["sgm_row_pass_floor_dw_ms_teddy"] = round(
            (v + 2 * dg) * 375 / 1e3, 4)

    # --- lane shift via slice+pad instead of roll (does Mosaic lower a
    # static lane shift cheaper than a rotate?) ---
    def band_step_slice(i, y, c, m0, m1):
        pm = jnp.min(y, axis=1, keepdims=True)
        yn = y - pm
        inf_col = jnp.full((W, 1), jnp.float32(jnp.inf))
        up = jnp.concatenate([inf_col, yn[:, :D - 1]], axis=1) \
            + jnp.float32(0.1)
        dn = jnp.concatenate([yn[:, 1:], inf_col], axis=1) \
            + jnp.float32(0.1)
        band = jnp.minimum(jnp.minimum(yn, up),
                           jnp.minimum(dn, jnp.float32(0.2)))
        return c + band + (jnp.float32(1e-7) * i)

    op_us("band_step_slice_f32", band_step_slice)

    # Projected VPU floor for one 3-family sweep pass at teddy (375 rows):
    v = results.get("band_step_vertical_f32")
    dg = results.get("band_step_diagonal_f32")
    if isinstance(v, float) and isinstance(dg, float):
        per_row_us = v + 2 * dg
        results["sgm_row_pass_floor_ms_teddy"] = round(
            per_row_us * 375 / 1e3, 4)
        print(f"-> projected 3-family row-pass VPU floor at teddy: "
              f"{results['sgm_row_pass_floor_ms_teddy']} ms",
              file=sys.stderr, flush=True)

    # ------------------------------------------------------------------
    # Bandwidth probes: copy (read+write) and pure-read streams over a
    # size sweep.  Small arrays are noise-dominated on the relay (64 MB
    # probes measured up to 6.4 TB/s); the calibrated roofline is the max
    # over the *largest* size, where one chain-iteration diff is tens of
    # ms.  Arrays are always passed as arguments, never closure-captured
    # (a captured array is embedded in the program literal — 512 MB blows
    # the remote-compile relay's request limit).
    # ------------------------------------------------------------------
    BR = 256

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.float32(1e-7)

    def bw(name, body, arr, bytes_per_iter, chain_k):
        ms = marginal_ms(body, arr, chain_k=chain_k, repeats=args.repeats)
        gbps = bytes_per_iter / 1e9 / (ms / 1e3) if ms > 0 else float("nan")
        results[f"bw_{name}_gbps"] = round(gbps, 1)
        print(f"bw_{name:26s} {gbps:8.1f} GB/s", file=sys.stderr,
              flush=True)
        return gbps

    for mb in (64, 256, 512):
        rows = mb * 1024 * 1024 // (4096 * 4)
        n = rows * 4096
        big = jax.device_put(np.arange(n, dtype=np.float32)
                             .reshape(rows, 4096))
        # Keep the marginal-time signal roughly constant (~50 ms) across
        # sizes: more chained iterations for the small arrays.
        ck = max(args.chain, 2048 // mb)

        # (a) XLA roll-copy (the round-2 probe).
        bw(f"xla_roll_{mb}mb",
           lambda x: jnp.roll(x, 1, axis=0) + jnp.float32(1e-7),
           big, 2 * n * 4, ck)

        # (b) Pallas streaming copy: block-in, block-out, nothing else.
        @jax.jit
        def pallas_copy(x, rows=rows):
            return pl.pallas_call(
                copy_kernel,
                grid=(rows // BR,),
                in_specs=[pl.BlockSpec((BR, 4096), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BR, 4096), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 4096), jnp.float32),
            )(x)

        bw(f"pallas_copy_{mb}mb", pallas_copy, big, 2 * n * 4, ck)

        # (c) XLA pure-read reduce: scalar carry + the array riding along
        # unchanged; the s-dependent fused multiply cannot be hoisted.
        def reduce_body(carry):
            s, arr = carry
            return (jnp.sum(arr * (jnp.float32(1.0)
                                   + s * jnp.float32(1e-12))), arr)

        bw(f"xla_reduce_read_{mb}mb", reduce_body,
           (jnp.float32(0.0), big), n * 4, ck)
        del big

    copy_keys = [k for k in results
                 if k.startswith(("bw_xla_roll", "bw_pallas_copy"))
                 and isinstance(results[k], float)]
    read_keys = [k for k in results if k.startswith("bw_xla_reduce_read")
                 and isinstance(results[k], float)]
    if copy_keys:
        results["calibrated_copy_gbps"] = max(results[k] for k in copy_keys
                                              if "512" in k or "256" in k)
    if read_keys:
        results["calibrated_read_gbps"] = max(results[k] for k in read_keys
                                              if "512" in k or "256" in k)
    print(f"calibrated: copy {results.get('calibrated_copy_gbps')} GB/s, "
          f"read {results.get('calibrated_read_gbps')} GB/s",
          file=sys.stderr, flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
