"""SSD box-sum on the MXU: is a banded matmul faster than reduce_window?

The separable box filter's per-axis cost in the XLA formulation is ~2k
VPU adds per element (reduce_window lowers O(k)); as a banded 0/1 matrix
multiply it is H*H*W*D MACs — 16 GFLOP at teddy, trivia for the MXU —
bounded by volume traffic instead of VPU adds.  Variants measured:

  * current: reduce_window on both axes (the shipping formulation);
  * mxu_h:   H-axis box as einsum('ih,iwd->hwd') (leading-axis
             contraction, no transposes), W-axis stays reduce_window;
  * mxu_hw:  both axes as matmuls (the W contraction forces a transposed
             dot output — XLA inserts a relayout copy).

Float-only (integer SSD keeps the exact reduce_window path).  Parity is
checked on-chip at last-ulp scale before timing.

Writes benchmarks/ssd_mxu_probe_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from stereomatch_tpu.ops.cost import (_box_sum, _inf_value,
                                      shifted_right_stack, ssd_cost_volume)
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "ssd_mxu_probe_out.json"
results = {}


def record(name, val):
    results[name] = val if isinstance(val, dict) else round(val, 4)
    print(f"{name:40s} {val}", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def box_matrix(n, k):
    """[N_in, N_out] 0/1 band: B[i, o] = 1 iff i in [o-k, o+k)."""
    i = np.arange(n)[:, None]
    o = np.arange(n)[None, :]
    return jnp.asarray(((i >= o - k) & (i < o + k)), jnp.float32)


def make_ssd(variant, h, w, d, k):
    bh = box_matrix(h, k)
    bw = box_matrix(w, k)

    def ssd(left, right):
        shifted = shifted_right_stack(right, d)
        diff = left[:, :, None] - shifted
        w_idx = lax.broadcasted_iota(jnp.int32, (w, d), 0)
        d_idx = lax.broadcasted_iota(jnp.int32, (w, d), 1)
        valid = (w_idx >= d_idx)[None]
        term = jnp.where(valid, diff * diff, 0.0)
        if variant == "mxu_h":
            t = jnp.einsum("ih,iwd->hwd", bh, term,
                           preferred_element_type=jnp.float32)
            t = _box_sum(t, k, axes=(1,))
        elif variant == "mxu_h_highest":
            # f32-exact MXU passes (bf16x6): default precision truncates
            # the f32 summands to bf16 mantissas (~1e-3 rel error, far
            # beyond the 2e-6 oracle tolerance).
            t = jnp.einsum("ih,iwd->hwd", bh, term,
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
            t = _box_sum(t, k, axes=(1,))
        elif variant == "mxu_hw":
            t = jnp.einsum("ih,iwd->hwd", bh, term,
                           preferred_element_type=jnp.float32)
            t = jnp.einsum("hid,iw->hwd", t, bw,
                           preferred_element_type=jnp.float32)
        else:
            t = _box_sum(term, k, axes=(0, 1))
        return jnp.where(valid, t, _inf_value(jnp.float32))

    return jax.jit(ssd)


def main():
    rng = np.random.default_rng(0)
    h, w, d, k = 375, 450, 128, 7
    l2 = jax.device_put(rng.random((h, w), np.float32))
    r2 = jax.device_put(rng.random((h, w), np.float32))

    ref = np.asarray(ssd_cost_volume(l2, r2, max_disparity=d, kernel_size=k))
    fin = np.isfinite(ref)
    for variant in ("current", "mxu_h", "mxu_h_highest", "mxu_hw"):
        out = np.asarray(make_ssd(variant, h, w, d, k)(l2, r2))
        rel = float(np.max(np.abs(out[fin] - ref[fin])
                           / np.maximum(np.abs(ref[fin]), 1e-6)))
        inf_ok = bool(np.array_equal(fin, np.isfinite(out)))
        record(f"parity_{variant}", {"max_rel": rel, "inf_ok": inf_ok})

    for variant in ("current", "mxu_h", "mxu_h_highest", "mxu_hw"):
        fn = make_ssd(variant, h, w, d, k)

        def body(carry, fn=fn):
            left, right = carry
            v = fn(left, right)
            return left + jnp.float32(1e-12) * v[:, :, 0], right

        record(f"ssd_{variant}_teddy_d128",
               marginal_ms(body, (l2, r2), 8, 5))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
