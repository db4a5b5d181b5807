"""Round-4 feasibility probe for a FUSED CVF Pallas kernel (round-5 lead).

The wedge CVF runs 3.54 ms at teddy — 8 separable box passes in XLA.
A fused kernel would stream the volume once: per input row, compute the
masked statistics, W-box them in VMEM (doubling shifts along the
sublane axis), and maintain H-direction running sums — per-element
work O(1) in the H radius and O(log r) in W.

This probe measures the question that decides the design: what does
ONE grid row of that loop actually cost on the chip?  It runs the
stage-1 core (5 statistic producers + 5 masked W-boxes + 5 running-sum
updates + the (a, b) algebra) per row, with the ring-buffer and
stage-2 mechanics approximated by a second running-sum update — the
full kernel would add ~30% more elementwise work.  ms_total x
(overhead factor) vs the 3.54 ms XLA wedge path is the go/no-go.

Usage: python benchmarks/cvf_fused_probe_r4.py [--json OUT.json]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereomatch_tpu.utils.benchmarking import marginal_ms


def _wbox_doubling(x, radius, width):
    """TIMING-representative clipped W box via doubling sublane shifts.

    The real kernel's masked-doubling box costs ceil(log2(2r+1)) + 2
    shift stages of (roll + iota-compare + select + add); this emits
    exactly that op mix (the border-clip bookkeeping the production
    version needs is the same ops with different constants, so the
    measured cost transfers; values here are NOT the exact box).
    """
    w_idx = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    total = x
    m = 1
    stages = 0
    while m <= 2 * radius:
        shifted = pltpu.roll(total, (-m) % width, axis=0)
        ok = w_idx + m < width
        total = total + jnp.where(ok, shifted, 0.0)
        m *= 2
        stages += 1
    for j in (radius, -(radius + 1)):       # the two re-center taps
        shifted = pltpu.roll(total, j % width, axis=0)
        ok = (w_idx + j >= 0) & (w_idx + j < width)
        total = total + jnp.where(ok, shifted, 0.0)
    return total


def _fused_row_kernel(p_ref, g_ref, out_ref, s_ref, s2_ref, *, radius,
                      width, reps):
    """One output row of the fused CVF stage-1 loop, repeated ``reps``
    times for the marginal-cost measurement."""
    p = p_ref[0].astype(jnp.float32)                   # [W, D]
    g = g_ref[0, :, 0][:, None]                        # [W, 1] guide col
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    def body(_, carry):
        acc = carry
        finite = jnp.isfinite(p)
        w = finite.astype(jnp.float32)
        p0 = jnp.where(finite, p, 0.0)
        gp = g * p0
        gw = g * w
        ggw = g * gw
        stats = (w, p0, gp, gw, ggw)
        boxed = [_wbox_doubling(s, radius, width) for s in stats]
        # H running sums (add side; the subtract side costs the same).
        for idx, b in enumerate(boxed):
            s_ref[idx] = s_ref[idx] + b
        # Stage-2-equivalent second update + (a, b) algebra.
        cnt = jnp.maximum(s_ref[0], 1.0)
        mean_p = s_ref[1] / cnt
        mean_i = s_ref[3] / cnt
        corr_ip = s_ref[2] / cnt
        corr_ii = s_ref[4] / cnt
        var = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
        a = (corr_ip - mean_i * mean_p) / (var + 1e-4)
        b = mean_p - a * mean_i
        s2_ref[0] = s2_ref[0] + a
        s2_ref[1] = s2_ref[1] + b
        return acc + a[:, :1]

    acc = lax.fori_loop(0, reps, body, jnp.zeros((width, 1), jnp.float32))
    out_ref[0] = (s2_ref[0] + s2_ref[1] * g + acc).astype(out_ref.dtype)


def fused_pass(vol, guide3, radius, reps, interpret=False):
    h, w, d = vol.shape
    kernel = functools.partial(_fused_row_kernel, radius=radius, width=w,
                               reps=reps)
    return pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, w, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, w, d), jnp.float32),
            pltpu.VMEM((2, w, d), jnp.float32),
        ],
        interpret=interpret,
    )(vol, guide3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/cvf_fused_probe_r4_out.json")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    h, w, d, r = 375, 456, 128, 8
    rng = np.random.default_rng(0)
    vol = jax.device_put(rng.random((h, w, d), np.float32))
    g3 = jax.device_put(rng.random((h, w, 1), np.float32))

    results = {}
    for reps in (1, 3):
        def body(c, reps=reps):
            out = fused_pass(c, g3, r, reps)
            return c + jnp.float32(1e-12) * out[:, :, :1]
        ms = marginal_ms(body, vol, args.chain, args.repeats)
        results[f"fused_stage1_reps{reps}_ms"] = round(ms, 3)
        print(f"reps={reps}: {ms:.3f} ms")
    per_rep = (results["fused_stage1_reps3_ms"]
               - results["fused_stage1_reps1_ms"]) / 2
    results["core_loop_ms_per_volume"] = round(per_rep, 3)
    results["verdict"] = (
        "core stage-1 loop per volume sweep; the full fused kernel adds "
        "the subtract-side updates, ring reads and the output pass "
        "(~+30-50%) on top, plus ~0.25 ms of HBM traffic — compare "
        "against the 3.54 ms XLA wedge path")
    print(json.dumps(results))
    pathlib.Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
