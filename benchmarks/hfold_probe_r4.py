"""Round-4 probe: fold the horizontal SGM family into the row passes?

VERDICT r3 next #2 proposes running the horizontal family's in-row W
recurrence inside the row-direction passes (whose [rows_per_step, W, D]
blocks are already VMEM-resident), eliminating the two separate
horizontal passes' ~6 volume transfers.  The catch this probe
quantifies: the horizontal column step then operates on
[rows_per_step, D] tiles (rows_per_step ~ 8 at teddy under the VMEM
budget) instead of the natural sweep's [H, D] planes — per-op fixed
overhead is amortized over 1 sublane tile instead of ~47, so the
horizontal COMPUTE inflates by some factor this probe measures.

Decision arithmetic (teddy 450x375 D=128, ~0.105 ms per volume
transfer at the measured ~800 GB/s):

    folded_gain = saved_transfers * 0.105 - (hfold_ms - hnat_ms)

where hnat is the shipped natural sweep's compute and hfold the
same recurrence at block height hc.

Usage: python benchmarks/hfold_probe_r4.py [--json OUT.json]
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
from stereomatch_tpu.ops import sgm_pallas


def _hfold_kernel(cost_ref, p2_ref, out_ref, carry_ref, mask_ref, *,
                  penalty1, width):
    """Horizontal forward scan with H on the grid: block [hc, W, D],
    carry [hc, D] — the shape the fold into a row pass would force."""
    hc, _, max_disp = cost_ref.shape
    p1 = jnp.float32(penalty1)
    carry_ref[...] = jnp.zeros_like(carry_ref)
    inf = jnp.float32(jnp.inf)
    lane = lax.broadcasted_iota(jnp.int32, (hc, max_disp), 1)
    ones = jnp.full((hc, max_disp), p1, jnp.float32)
    mask_ref[0] = jnp.where(lane == 0, inf, ones)
    mask_ref[1] = jnp.where(lane == max_disp - 1, inf, ones)
    for w in range(width):
        cst = cost_ref[:, w, :].astype(jnp.float32)          # [hc, D]
        prev = carry_ref[0]
        pm = jnp.min(prev, axis=1, keepdims=True)
        pn = prev - pm
        up = sgm_pallas._band_shift(pn, 1) + mask_ref[0]
        dn = sgm_pallas._band_shift(pn, -1) + mask_ref[1]
        p2a = p2_ref[:, w][:, None]
        band = jnp.minimum(jnp.minimum(pn, up), jnp.minimum(dn, p2a))
        val = cst + band
        carry_ref[0] = val
        out_ref[:, w, :] = val.astype(out_ref.dtype)


def hfold_pass(cost, p2map, hc, penalty1=0.1, interpret=False):
    height, width, max_disp = cost.shape
    kernel = functools.partial(_hfold_kernel, penalty1=penalty1,
                               width=width)
    return pl.pallas_call(
        kernel,
        grid=(height // hc,),
        in_specs=[
            pl.BlockSpec((hc, width, max_disp), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, width), lambda h: (h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hc, width, max_disp), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width, max_disp),
                                       cost.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, hc, max_disp), jnp.float32),
            pltpu.VMEM((2, hc, max_disp), jnp.float32),
        ],
        interpret=interpret,
    )(cost, p2map)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/hfold_probe_r4_out.json")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    h, w, d = 384, 456, 128          # teddy-like, rich in hc divisors
    cost = jax.device_put(rng.random((h, w, d), np.float32))
    image = jax.device_put(rng.random((h, w), np.float32))
    p2map = sgm_pallas._p2_map_horizontal(image, 0.1, 0.2, reverse=False)
    p2map = jax.device_put(np.asarray(p2map))

    # Correctness: hfold (any hc) must equal the shipped natural sweep.
    chunk = sgm_pallas._pick_hsweep_chunk(h, w, d)
    ref = np.asarray(sgm_pallas._hsweep_pass_natural(
        cost, p2map, None, penalty1=0.1, reverse=False, chunk=chunk))
    got = np.asarray(hfold_pass(cost, p2map, 8))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)
    print("hfold hc=8 bit-equal to natural sweep: ok")

    results = {}

    def bench(name, fn):
        def body(carry):
            c = carry
            out = fn(c)
            return c + jnp.float32(1e-12) * out[:, :, :1]
        ms = marginal_ms(body, cost, args.chain, args.repeats)
        results[name] = round(ms, 4)
        print(f"{name:28s} {ms:8.3f} ms")

    bench("hsweep_natural_SHIPPED",
          lambda c: sgm_pallas._hsweep_pass_natural(
              c, p2map, None, penalty1=0.1, reverse=False, chunk=chunk))
    # hc is VMEM-bound: cost + out blocks are 2 * hc * 0.23 MB at teddy
    # width; hc=32 (~15 MB) probes past the production budget on purpose.
    for hc in (8, 16, 32):
        if h % hc == 0:
            try:
                bench(f"hfold_hc{hc}",
                      functools.partial(hfold_pass, p2map=p2map, hc=hc))
            except Exception as e:                     # VMEM overflow
                results[f"hfold_hc{hc}"] = f"failed: {type(e).__name__}"
                print(f"hfold_hc{hc} failed: {e}")

    out = {"geometry": f"{w}x{h} d={d}",
           "device": str(jax.devices()[0].device_kind),
           "results": results}
    pathlib.Path(args.json).write_text(json.dumps(out, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
