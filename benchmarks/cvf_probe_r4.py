"""Round-4 CVF restructuring probe (verdict directive #3).

Question: can the guided cost-volume filter reach <= 2.0 ms at teddy
(450x375, D=128, r=8) — faster than SGM (2.7 ms), as its "low-latency
aggregation" positioning promises?

Levers measured here, each as a same-process A/B against the shipped
masked path (relay variance is +-20% cross-run; only same-process
marginals are trustworthy):

  1. ``prefix``  — O(1)-per-element prefix-difference (integral image)
     box sums instead of O(r) ``reduce_window`` taps, per axis.  CVF's
     count-normalized means are NOT oracle-pinned to the reference's
     summation order, so the exactness argument that bars cumsum for SSD
     does not apply (VERDICT r3 next #3).
  2. ``wedge``   — exploit that the +inf invalid region of SSD/SAD/BT
     volumes is the STATIC wedge x < d + offset, independent of y: the
     three masked guide statistics box(valid), box(g*valid),
     box(g^2*valid) collapse from volume-sized box passes into
     elementwise reconstructions from [H, W] prefix planes (the ZNCC
     plane-algebra trick, ops/cost.py r3), leaving only 4 genuine
     volume stats (p0, g*p0, a, b) = 8 box passes instead of 14.
  3. ``finite``  — the assume_finite path (what census/ZNCC pipelines
     can use): 8 passes today, fewer with prefix.

Usage: python benchmarks/cvf_probe_r4.py [--json OUT.json]
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

from stereomatch_tpu.utils.benchmarking import marginal_ms
from stereomatch_tpu.ops.cvf import (guided_filter_aggregate, _box_sum_sym,
                                     _linear_model)


# ----------------------------------------------------------------------
# Candidate box-sum lowerings
# ----------------------------------------------------------------------

def box_prefix(x, radius, axis):
    """Clipped symmetric box sum via zero-prepended prefix differences."""
    n = x.shape[axis]
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(lax.slice_in_dim(c, 0, 1, axis=axis))
    p = jnp.concatenate([zero, c], axis=axis)          # [.., n+1, ..]
    pad_hi = [(0, 0)] * x.ndim
    pad_hi[axis] = (0, radius)
    hi = jnp.pad(p, pad_hi, mode="edge")
    hi = lax.slice_in_dim(hi, radius + 1, radius + 1 + n, axis=axis)
    pad_lo = [(0, 0)] * x.ndim
    pad_lo[axis] = (radius, 0)
    lo = jnp.pad(p, pad_lo, mode="edge")
    lo = lax.slice_in_dim(lo, 0, n, axis=axis)
    return hi - lo


def box_sym_variant(x, radius, axes=(0, 1), mode="rw"):
    if mode == "rw":
        return _box_sum_sym(x, radius, axes=axes)
    for ax in axes:
        x = box_prefix(x, radius, ax)
    return x


# ----------------------------------------------------------------------
# Masked path with pluggable box (mirror of ops/cvf.py::_filter_body)
# ----------------------------------------------------------------------

def masked_cvf(volume, guide, radius, eps, mode):
    box = functools.partial(box_sym_variant, radius=radius, mode=mode)
    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    g = i32[:, :, None]
    finite = jnp.isfinite(p32)
    valid = finite.astype(jnp.float32)
    p0 = jnp.where(finite, p32, 0.0)
    count = jnp.maximum(box(valid), 1.0)
    mean_p = box(p0) / count
    mean_i = box(g * valid) / count
    corr_ip = box(g * p0) / count
    corr_ii = box(g * g * valid) / count
    a, b = _linear_model(mean_p, mean_i, corr_ip, corr_ii, eps)
    q = ((box(a * valid) / count) * g + box(b * valid) / count)
    return jnp.where(finite, q, jnp.float32(jnp.inf)).astype(volume.dtype)


def finite_cvf(volume, guide, radius, eps, mode):
    box = functools.partial(box_sym_variant, radius=radius, mode=mode)
    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    g = i32[:, :, None]
    ones = jnp.ones(p32.shape[:2], jnp.float32)
    count = box(ones)[:, :, None]
    mean_p = box(p32) / count
    corr_ip = box(g * p32) / count
    mean_i = (box(i32) / count[:, :, 0])[:, :, None]
    corr_ii = (box(i32 * i32) / count[:, :, 0])[:, :, None]
    a, b = _linear_model(mean_p, mean_i, corr_ip, corr_ii, eps)
    q = (box(a) / count) * g + box(b) / count
    return q.astype(volume.dtype)


# ----------------------------------------------------------------------
# Wedge-structured path: valid iff x >= d + offset (static in y)
# ----------------------------------------------------------------------

def _prefix_planes(plane, radius):
    """[H, W] plane -> (hi, lo) shifted prefix planes + raw prefix.

    hi[y, x] = P[y, min(x+r+1, W)], lo[y, x] = P[y, max(x-r, 0)] where
    P is the zero-prepended W-prefix of ``plane``.
    """
    h, w = plane.shape
    p = jnp.concatenate([jnp.zeros((h, 1), plane.dtype),
                         jnp.cumsum(plane, axis=1)], axis=1)   # [H, W+1]
    hi = jnp.pad(p, ((0, 0), (0, radius)), mode="edge")[:, radius + 1:
                                                        radius + 1 + w]
    lo = jnp.pad(p, ((0, 0), (radius, 0)), mode="edge")[:, :w]
    return hi, lo, p


def wedge_cvf(volume, guide, radius, eps, offset=0, mode="rw"):
    h, w = guide.shape
    d = volume.shape[2]
    r = radius
    box = functools.partial(box_sym_variant, radius=r, mode=mode)

    x_id = lax.broadcasted_iota(jnp.int32, (w, d), 0)
    d_id = lax.broadcasted_iota(jnp.int32, (w, d), 1) + offset
    valid_wd = x_id >= d_id                                  # [W, D]

    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    g = i32[:, :, None]
    p0 = jnp.where(valid_wd[None], p32, 0.0)

    s_p = box(p0)                                            # 2 vol passes
    s_gp = box(g * p0)                                       # 2 vol passes

    # Guide statistics from [H, W] planes + elementwise reconstruction.
    g1 = _box_sum_sym(i32, r, axes=(0,))                     # boxH(g)
    g2 = _box_sum_sym(i32 * i32, r, axes=(0,))               # boxH(g^2)
    hi1, lo1, p1 = _prefix_planes(g1, r)
    hi2, lo2, p2 = _prefix_planes(g2, r)
    # Pd[y, dd] = P[y, clip(dd + offset, 0, W)] — contiguous columns of
    # the prefix plane (edge-pad if offset + D overruns), a static slice
    # rather than a gather (XLA:TPU lowers arbitrary gathers to scalar
    # loops — the ZNCC lesson).
    lo_col = max(0, min(offset, w))
    overrun = max(0, offset + d - (w + 1))
    p1e = jnp.pad(p1, ((0, 0), (0, overrun)), mode="edge")
    p2e = jnp.pad(p2, ((0, 0), (0, overrun)), mode="edge")
    pd1 = lax.slice_in_dim(p1e, lo_col, lo_col + d, axis=1)  # [H, D]
    pd2 = lax.slice_in_dim(p2e, lo_col, lo_col + d, axis=1)
    cond = (x_id - r) >= d_id                                # [W, D]
    s_g = hi1[:, :, None] - jnp.where(cond[None], lo1[:, :, None],
                                      pd1[:, None, :])
    s_gg = hi2[:, :, None] - jnp.where(cond[None], lo2[:, :, None],
                                       pd2[:, None, :])

    y_id = jnp.arange(h)
    count_h = (jnp.minimum(y_id + r, h - 1)
               - jnp.maximum(y_id - r, 0) + 1).astype(jnp.float32)
    cnt_w = jnp.maximum(
        jnp.minimum(x_id + r, w - 1)
        - jnp.maximum(jnp.maximum(x_id - r, 0), d_id) + 1, 0
    ).astype(jnp.float32)                                    # [W, D]
    count = jnp.maximum(count_h[:, None, None] * cnt_w[None], 1.0)

    a, b = _linear_model(s_p / count, s_g / count, s_gp / count,
                         s_gg / count, eps)
    a0 = jnp.where(valid_wd[None], a, 0.0)
    b0 = jnp.where(valid_wd[None], b, 0.0)
    q = (box(a0) / count) * g + box(b0) / count              # 4 vol passes
    return jnp.where(valid_wd[None], q,
                     jnp.float32(jnp.inf)).astype(volume.dtype)


# ----------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/cvf_probe_r4_out.json")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--radius", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    h, w, d = 375, 450, 128
    guide = jax.device_put(rng.random((h, w), np.float32))
    # Realistic volume: finite everywhere except the standard wedge.
    vol_np = rng.random((h, w, d), np.float32)
    x_id, d_id = np.meshgrid(np.arange(w), np.arange(d), indexing="ij")
    vol_np[:, x_id < d_id] = np.inf
    vol = jax.device_put(vol_np)
    vol_fin = jax.device_put(rng.random((h, w, d), np.float32))
    r, eps = args.radius, 1e-4

    # ---- correctness cross-checks (small geometry, vs shipped path) ----
    hs, ws, ds = 20, 30, 12
    gs = rng.random((hs, ws), np.float32)
    vs = rng.random((hs, ws, ds), np.float32)
    xs, dss = np.meshgrid(np.arange(ws), np.arange(ds), indexing="ij")
    vs[:, xs < dss] = np.inf
    ref = np.asarray(guided_filter_aggregate(vs, gs, radius=3))
    m = np.isfinite(ref)
    for name, fn in [
        ("masked_prefix", lambda: masked_cvf(vs, gs, 3, 1e-4, "prefix")),
        ("wedge_rw", lambda: wedge_cvf(vs, gs, 3, 1e-4, 0, "rw")),
        ("wedge_prefix", lambda: wedge_cvf(vs, gs, 3, 1e-4, 0, "prefix")),
    ]:
        out = np.asarray(jax.jit(fn)())
        assert np.array_equal(np.isinf(out), ~m), name
        err = np.max(np.abs(out[m] - ref[m]) / (np.abs(ref[m]) + 1e-6))
        print(f"  check {name}: max_rel={err:.2e}")
        assert err < 1e-3, (name, err)

    fns = {
        "masked_rw_SHIPPED": lambda v, g: guided_filter_aggregate(v, g,
                                                                  radius=r),
        "masked_prefix": jax.jit(lambda v, g: masked_cvf(v, g, r, eps,
                                                         "prefix")),
        "wedge_rw": jax.jit(lambda v, g: wedge_cvf(v, g, r, eps, 0, "rw")),
        "wedge_prefix": jax.jit(lambda v, g: wedge_cvf(v, g, r, eps, 0,
                                                       "prefix")),
        "finite_rw": jax.jit(lambda v, g: finite_cvf(v, g, r, eps, "rw")),
        "finite_prefix": jax.jit(lambda v, g: finite_cvf(v, g, r, eps,
                                                         "prefix")),
    }

    def feedback(v, out):
        probe = jnp.where(jnp.isfinite(out[:, :, 0]), out[:, :, 0], 0.0)
        return v + jnp.float32(1e-12) * probe[:, :, None]

    results = {}
    for name, fn in fns.items():
        use_vol = vol_fin if name.startswith("finite") else vol

        def body(carry, fn=fn):
            v, g = carry
            return feedback(v, fn(v, g)), g

        ms = marginal_ms(body, (use_vol, guide), args.chain, args.repeats)
        results[name] = round(ms, 4)
        print(f"{name:24s} {ms:8.3f} ms")

    out = {"geometry": f"{w}x{h} d={d} r={r}",
           "device": str(jax.devices()[0].device_kind), "results": results}
    pathlib.Path(args.json).write_text(json.dumps(out, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
