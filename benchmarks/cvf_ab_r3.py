"""CVF A/B: stacked-statistics box passes vs separate (fusion-friendly)
box calls, with and without the MXU leading-axis pass.

The stacking idiom was adopted to cut materializations, but the round-3
SSD lesson says reduce_window FUSES its elementwise producer while a
concatenate materializes its operands — so separate box calls may move
LESS HBM despite being five calls instead of one.  Both variants are
documented bit-identical (windows span (H, W) only; lanes independent).

Writes benchmarks/cvf_ab_r3_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops import cvf as cvf_mod
from stereomatch_tpu.ops.cvf import _box_sum_sym, _linear_model
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "cvf_ab_r3_out.json"
results = {}


def record(name, val):
    results[name] = val if isinstance(val, dict) else round(val, 4)
    print(f"{name:44s} {val}", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def cvf_unstacked(volume, guide, radius=8, eps=1e-4):
    """Guided filter with SEPARATE box calls per statistic (masked path),
    matching ops/cvf.py semantics value-for-value."""
    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    box = functools.partial(_box_sum_sym, radius=radius)
    g = i32[:, :, None]
    finite = jnp.isfinite(p32)
    valid = finite.astype(jnp.float32)
    p0 = jnp.where(finite, p32, 0.0)
    n = box(valid)
    count = jnp.maximum(n, 1.0)
    mean_p = box(p0) / count
    mean_i = box(g * valid) / count
    corr_ip = box(g * p0) / count
    corr_ii = box(g * g * valid) / count
    a, b = _linear_model(mean_p, mean_i, corr_ip, corr_ii, eps)
    a_bar = box(a * valid) / count
    b_bar = box(b * valid) / count
    q = a_bar * g + b_bar
    return jnp.where(finite, q, jnp.inf).astype(volume.dtype)


def main():
    rng = np.random.default_rng(0)
    h, w, d = 375, 450, 128
    guide = jax.device_put(rng.random((h, w), np.float32))
    vol = rng.random((h, w, d)).astype(np.float32)
    widx = np.arange(w)[:, None]
    didx = np.arange(d)[None, :]
    vol[:, widx[:, 0] < 8, :] = vol[:, :8, :]      # keep some structure
    vol = np.where((widx >= didx)[None], vol, np.inf).astype(np.float32)
    vol = jax.device_put(vol)

    ref = np.asarray(cvf_mod.guided_filter_aggregate(vol, guide))
    # Parity spot check (the stacked path's second stage normalizes the
    # a/b means over the same count — compare where finite).
    out = np.asarray(cvf_unstacked(vol, guide))
    fin = np.isfinite(ref)
    rel = float(np.max(np.abs(out[fin] - ref[fin])
                       / np.maximum(np.abs(ref[fin]), 1e-6)))
    record("parity_unstacked", {"max_rel": rel,
                                "inf_ok": bool(np.array_equal(
                                    fin, np.isfinite(out)))})

    stacked_fn = jax.jit(lambda v, g: cvf_mod._filter_body(
        v, g, 8, 1e-4, False))

    def body_stacked(carry):
        v, g = carry
        o = stacked_fn(v, g)
        return v + jnp.float32(1e-12) * jnp.where(jnp.isfinite(o), o,
                                                  0.0)[:, :, :1], g

    def body_unstacked(carry):
        v, g = carry
        o = cvf_unstacked(v, g)
        return v + jnp.float32(1e-12) * jnp.where(jnp.isfinite(o), o,
                                                  0.0)[:, :, :1], g

    record("cvf_stacked_teddy", marginal_ms(body_stacked, (vol, guide),
                                            8, 5))
    record("cvf_unstacked_teddy", marginal_ms(jax.jit(body_unstacked),
                                              (vol, guide), 8, 5))

    # And without the MXU leading-axis pass on both:
    from stereomatch_tpu.ops import cost as cost_mod
    cost_mod._BOX_MXU_MAX_N = 0
    record("cvf_stacked_teddy_rw", marginal_ms(body_stacked, (vol, guide),
                                               8, 5))
    record("cvf_unstacked_teddy_rw",
           marginal_ms(jax.jit(body_unstacked), (vol, guide), 8, 5))
    cost_mod._BOX_MXU_MAX_N = 512

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
