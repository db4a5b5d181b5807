"""Two more in-pipeline SSD A/Bs (same-process, the only trustworthy
kind on this relay):

  a) box axis order: W-axis reduce_window first, then H — identical
     sums (additive-identity pads commute exactly), possibly different
     fusion/layout behavior;
  b) shifted stack built from log2(D) lane-rolls + selects instead of
     the jnp.take gather — rolls/selects are elementwise-ish and may
     fuse into the first reduce_window where the gather materializes.

Writes benchmarks/ssd_fusion_ab_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from stereomatch_tpu.ops import sgm_pallas
from stereomatch_tpu.ops.cost import _box_sum, _inf_value
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "ssd_fusion_ab_out.json"
results = {}


def record(name, val):
    results[name] = val if isinstance(val, dict) else round(val, 4)
    print(f"{name:40s} {val}", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def shifted_rolls(right, max_disparity):
    """S[h, w, d] = right[h, w-d] via log2(D) masked lane-rolls."""
    h, w = right.shape
    d_iota = lax.broadcasted_iota(jnp.int32, (w, max_disparity), 1)
    w_iota = lax.broadcasted_iota(jnp.int32, (w, max_disparity), 0)
    v = jnp.broadcast_to(right[:, :, None], (h, w, max_disparity))
    bit = 1
    while bit < max_disparity:
        take = ((d_iota & bit) != 0)[None]
        v = jnp.where(take, jnp.roll(v, bit, axis=1), v)
        bit *= 2
    return jnp.where((w_iota >= d_iota)[None], v, 0.0)


def make_ssd(variant, d, k):
    def ssd(left, right):
        h, w = left.shape
        if variant == "rolls":
            shifted = shifted_rolls(right, d)
        else:
            from stereomatch_tpu.ops.cost import shifted_right_stack
            shifted = shifted_right_stack(right, d)
        diff = left[:, :, None] - shifted
        w_idx = lax.broadcasted_iota(jnp.int32, (w, d), 0)
        d_idx = lax.broadcasted_iota(jnp.int32, (w, d), 1)
        valid = (w_idx >= d_idx)[None]
        term = jnp.where(valid, diff * diff, 0.0)
        axes = (1, 0) if variant == "wfirst" else (0, 1)
        cost = _box_sum(term, k, axes=axes, use_mxu=False)
        return jnp.where(valid, cost, _inf_value(jnp.float32))

    return ssd


def main():
    rng = np.random.default_rng(0)
    h, w, d, k = 375, 450, 128, 7
    l2 = jax.device_put(rng.random((h, w), np.float32))
    r2 = jax.device_put(rng.random((h, w), np.float32))

    base = np.asarray(jax.jit(make_ssd("base", d, k))(l2, r2))
    fin = np.isfinite(base)
    for variant in ("wfirst", "rolls"):
        out = np.asarray(jax.jit(make_ssd(variant, d, k))(l2, r2))
        rel = float(np.max(np.abs(out[fin] - base[fin])
                           / np.maximum(np.abs(base[fin]), 1e-6)))
        record(f"parity_{variant}",
               {"max_rel": rel,
                "inf_ok": bool(np.array_equal(fin, np.isfinite(out)))})

    for variant in ("base", "wfirst", "rolls"):
        ssd = make_ssd(variant, d, k)

        def body(carry, ssd=ssd):
            l, r = carry
            vol = ssd(l, r)
            agg = sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(
                vol, l, horizontal="natural")
            disp = winner_takes_all(agg)
            return l + jnp.float32(1e-12) * disp.astype(jnp.float32), r

        record(f"pipeline_{variant}",
               marginal_ms(jax.jit(body), (l2, r2), 8, 5))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
