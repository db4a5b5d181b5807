"""Fused Pallas kernel for wedge-structured guided cost-volume filtering.

The XLA wedge path (ops/cvf.py::_filter_body_wedge) runs 8 separable
box passes over the volume — 3.54 ms at teddy.  This kernel streams the
volume through a sequential grid over rows, holding every window
statistic in VMEM:

* **H boxes are running sums** (O(1) per element in the radius): a LEAD
  statistic set covers input rows [t, t+2r] (producing the linear model
  (a, b) at row t+r) and a LAG set covers [t-2r-1, t-1] (producing
  a(t-r-1)); the stage-2 accumulators A2/B2 then advance by
  a0(t+r) - a0(t-r-1), keeping exactly the a-rows [t-r, t+r] the output
  row t needs.  Per step the kernel reads three input-row views (rows
  t+2r, t-1 — shared by the lead-subtract and lag-add — and t-2r-2).
* **W boxes are unmasked roll chains**: the volume is pre-padded with
  ``rpad`` zero columns left and enough zero columns right that a
  doubling chain of ``pltpu.roll`` shifts computes the clipped
  symmetric box with no per-shift masks (wrap-around garbage lands
  only in never-read pad columns).  Measured on chip the chains are
  nearly free — sublane rolls + adds on resident rows; the kernel's
  cost is per-step structural overhead, which is why the I/O below is
  aggressively PACKED (every ref pays grid bookkeeping each step —
  packing 21 refs to 13 measured 3.58 -> 2.46 ms alone): guide + four
  prefix planes ride one [H', WP, 8] array, the two per-disparity
  prefix columns one [H', 2, D] array, the three (x, d) tables one
  [WP, 3D] constant, and paired statistics share roll chains stacked
  on the lane axis.
* **All wedge quantities are closed-form or plane inputs**: validity
  and window counts depend only on (x, d) and the row index, and the
  masked guide statistics arrive as the same prefix planes the XLA
  wedge path uses (ops/cvf.py::_prefix_planes_w), reconstructed per
  row with one select.
* **Warm-up costs no branches**: the grid starts 3r steps early and the
  volume carries zero pad rows top and bottom; zero rows produce zero
  statistics, so every running sum self-initializes, and the linear
  models of rows outside the image are gated to zero (an out-of-image
  row within r of the boundary has nonzero clipped p-statistics but
  zero guide-plane rows — ungated, cov/(0+eps) explodes; gated, the
  clipped stage-2 H-box semantics fall out exactly).  Early output
  writes land on row 0 and are overwritten by the real step t = 0.

Semantics match ``guided_filter_aggregate(..., wedge_offset=k)`` up to
floating-point association (same masked means, different summation
order); tests compare against the XLA wedge path and the shared
oracle.  bf16 volumes stream in storage dtype and compute f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cvf import _box_sum_sym, _prefix_planes_w


def _wbox_rolls(x, radius: int, width_padded: int):
    """Clipped symmetric (2r+1) W box over the sublane axis of [W', L].

    Layout contract (see module docstring): enough zero columns pad the
    left (>= radius) and right (>= 2*radius) of the data that the
    doubling chain needs no masks.  U_m[w] = sum_{j < m} x[w + j] by
    disjoint doubling (U_2m = U_m + roll(U_m, -m)), binary-decomposed
    tail, then the symmetric window is U_{2r+1} re-centered by one
    positive roll.
    """
    target = 2 * radius + 1
    powers = {1: x}
    m = 1
    while m * 2 <= target:
        powers[m * 2] = powers[m] + pltpu.roll(
            powers[m], (-m) % width_padded, axis=0)
        m *= 2
    u = powers[m]
    covered = m
    rem = target - m
    bit = 1
    while rem:
        if rem & bit:
            u = u + pltpu.roll(powers[bit],
                               (-covered) % width_padded, axis=0)
            covered += bit
            rem ^= bit
        bit *= 2
    return pltpu.roll(u, radius % width_padded, axis=0)


# Lane layout of the packed plane array: (guide, hi1, lo1, hi2, lo2).
_PL_LANES = 8


def _fused_wedge_kernel(p0add_ref, p0mid_ref, p0lag_ref,
                        pl_add_ref, pl_lead_ref, pl_out_ref, pl_mid_ref,
                        pl_lag_ref, pl_lagsub_ref,
                        pd_lead_ref, pd_lag_ref,
                        tab_ref,
                        out_ref,
                        slead_ref, slag_ref, s2_ref, *,
                        radius: int, eps: float, height: int,
                        width_padded: int, rpad: int, width: int):
    """One grid step t (= program_id - 3r): advance lead/lag stat sums,
    compute a0/b0 at rows t+r and t-r-1, advance A2/B2, emit row t.

    (A single [4r+3, WP, 8] windowed plane ref would cut six refs to
    one, but standard BlockSpec index maps are in BLOCK units —
    overlapping windows need unblocked indexing, which this jax does
    not expose — so the six single-row plane views below are the
    next-best packing.)
    """
    i = pl.program_id(0)
    r = radius
    t = i - 3 * r

    @pl.when(i == 0)
    def _init():
        slead_ref[...] = jnp.zeros_like(slead_ref)
        slag_ref[...] = jnp.zeros_like(slag_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    tab = tab_ref[...]                                 # [WP, 3D]
    d = tab.shape[1] // 3
    validf = tab[:, :d]
    cntw = tab[:, d:2 * d]
    condf = tab[:, 2 * d:]

    def stat_rows(p_ref, g_col):
        # Both statistics ride ONE roll chain, stacked on the lane axis
        # ([WP, 2D]): sublane rolls never mix lanes.
        p = p_ref[0].astype(jnp.float32)               # [WP, D]
        stacked = jnp.concatenate([p, g_col * p], axis=1)   # [WP, 2D]
        return _wbox_rolls(stacked, r, width_padded)

    add_s = stat_rows(p0add_ref, pl_add_ref[0, :, 0:1])
    mid_s = stat_rows(p0mid_ref, pl_mid_ref[0, :, 0:1])
    lag_s = stat_rows(p0lag_ref, pl_lagsub_ref[0, :, 0:1])
    slead_ref[0] = slead_ref[0] + add_s - mid_s
    slag_ref[0] = slag_ref[0] + mid_s - lag_s

    def count_h(row):
        lo = jnp.maximum(row - r, 0)
        hi = jnp.minimum(row + r, height - 1)
        return jnp.maximum(hi - lo + 1, 0).astype(jnp.float32)

    def ab_row(stacked, pl_row, pd_row, row):
        sp, sgp = stacked[:, :d], stacked[:, d:]
        hi1, lo1 = pl_row[:, 1:2], pl_row[:, 2:3]      # [WP, 1]
        hi2, lo2 = pl_row[:, 3:4], pl_row[:, 4:5]
        pd1, pd2 = pd_row[0:1, :], pd_row[1:2, :]      # [1, D]
        s_g = hi1 - jnp.where(condf > 0, lo1, pd1)
        s_gg = hi2 - jnp.where(condf > 0, lo2, pd2)
        count = jnp.maximum(count_h(row) * cntw, 1.0)
        inv = 1.0 / count
        mean_p = sp * inv
        mean_i = s_g * inv
        corr_ip = sgp * inv
        corr_ii = s_gg * inv
        var = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
        a = (corr_ip - mean_i * mean_p) / (var + jnp.float32(eps))
        b = mean_p - a * mean_i
        # Gate by cell validity AND row-in-image (see module docstring).
        rv = jnp.where((row >= 0) & (row < height), 1.0, 0.0)
        gate = validf * rv
        return jnp.concatenate([a * gate, b * gate], axis=1)

    ab_lead = ab_row(slead_ref[0], pl_lead_ref[0], pd_lead_ref[0], t + r)
    ab_lag = ab_row(slag_ref[0], pl_lag_ref[0], pd_lag_ref[0], t - r - 1)
    s2_ref[0] = s2_ref[0] + ab_lead - ab_lag

    # Output row t: q = (boxW(A2) * g + boxW(B2)) / count; invalid
    # cells restored to +inf.
    boxed = _wbox_rolls(s2_ref[0], r, width_padded)
    count_t = jnp.maximum(count_h(t) * cntw, 1.0)
    g_t = pl_out_ref[0, :, 0:1]
    q = (boxed[:, :d] * g_t + boxed[:, d:]) / count_t
    q = jnp.where(validf > 0, q, jnp.float32(jnp.inf))
    out_ref[0] = q[rpad:rpad + width].astype(out_ref.dtype)


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


@functools.partial(jax.jit, static_argnames=("radius", "eps",
                                             "wedge_offset", "interpret"))
def guided_filter_wedge_pallas(cost_volume: jnp.ndarray,
                               guide: jnp.ndarray, *,
                               radius: int = 8, eps: float = 1e-4,
                               wedge_offset: int = 0,
                               interpret: bool = False) -> jnp.ndarray:
    """Fused guided-filter aggregation for wedge volumes (see module
    docstring).  Drop-in for ``guided_filter_aggregate(...,
    wedge_offset=k)``; storage dtype preserved."""
    height, width, max_disp = cost_volume.shape
    r = int(radius)
    if r < 1:
        raise ValueError(f"radius must be >= 1 for the fused kernel, "
                         f"got {r}")
    off = int(wedge_offset)
    storage = cost_volume.dtype

    # ---- XLA preparation (plane passes + padded copies) -------------
    p32 = cost_volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    x_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 0)
    d_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1) + off
    valid_wd = x_id >= d_id
    p0 = jnp.where(valid_wd[None], p32, 0.0).astype(storage)

    # Column padding: rpad zero columns left (multiple of 8 so the
    # output slice stays sublane-aligned), right shelter >= 2r.
    rpad = _pad_to(r, 8)
    wp = _pad_to(rpad + width + 2 * r, 8)
    # Row padding: warm-up reads back to t-2r-2 at t = -3r, ahead to
    # t+2r at t = height-1.
    top = 5 * r + 2
    h_pad = height + top + 2 * r
    del h_pad  # (implied by the pads below)

    def pad_rows_cols(x):
        return jnp.pad(x, ((top, 2 * r), (rpad, wp - rpad - width))
                       + ((0, 0),) * (x.ndim - 2))

    p0p = pad_rows_cols(p0)

    # Guide prefix planes on the ORIGINAL grid (identical algebra to
    # ops/cvf.py::_filter_body_wedge), packed with the guide into one
    # [H', WP, 8] array.
    g1 = _box_sum_sym(i32, r, axes=(0,))
    g2 = _box_sum_sym(i32 * i32, r, axes=(0,))
    hi1, lo1, p1 = _prefix_planes_w(g1, r)
    hi2, lo2, p2 = _prefix_planes_w(g2, r)
    planes = jnp.stack([i32, hi1, lo1, hi2, lo2]
                       + [jnp.zeros_like(i32)] * (_PL_LANES - 5), axis=-1)
    planes = pad_rows_cols(planes)                     # [H', WP, 8]

    # Per-disparity prefix columns, packed [H', 1, 2D] (edge-clamped
    # exactly like the XLA wedge path's contiguous slice).
    lo_col = max(0, min(off, width))
    overrun = max(0, lo_col + max_disp - (width + 1))
    p1e = jnp.pad(p1, ((0, 0), (0, overrun)), mode="edge")
    p2e = jnp.pad(p2, ((0, 0), (0, overrun)), mode="edge")
    pd = jnp.stack(
        [lax.slice_in_dim(p1e, lo_col, lo_col + max_disp, axis=1),
         lax.slice_in_dim(p2e, lo_col, lo_col + max_disp, axis=1)], axis=1)
    pd = jnp.pad(pd, ((top, 2 * r), (0, 0), (0, 0)))       # [H', 2, D]

    # Constant (x, d) tables, packed [WP, 3D]: validity, clipped
    # W-window count, and the prefix-plane selector.
    xp_id = lax.broadcasted_iota(jnp.int32, (wp, max_disp), 0) - rpad
    dp_id = lax.broadcasted_iota(jnp.int32, (wp, max_disp), 1) + off
    validf = ((xp_id >= dp_id) & (xp_id < width)).astype(jnp.float32)
    cntw = jnp.maximum(
        jnp.minimum(xp_id + r, width - 1)
        - jnp.maximum(jnp.maximum(xp_id - r, 0), dp_id) + 1, 0
    ).astype(jnp.float32)
    condf = ((xp_id - r) >= dp_id).astype(jnp.float32)
    tab = jnp.concatenate([validf, cntw, condf], axis=1)

    # ---- pallas call ------------------------------------------------
    n_steps = height + 3 * r
    base = top - 3 * r          # padded row of original row t
    row = lambda ofs: (lambda i: (i + ofs, 0, 0))
    vol_spec = lambda ofs: pl.BlockSpec((1, wp, max_disp), row(ofs),
                                        memory_space=pltpu.VMEM)
    pl_spec = lambda ofs: pl.BlockSpec((1, wp, _PL_LANES), row(ofs),
                                       memory_space=pltpu.VMEM)
    pd_spec = lambda ofs: pl.BlockSpec((1, 2, max_disp), row(ofs),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused_wedge_kernel, radius=r, eps=float(eps), height=height,
        width_padded=wp, rpad=rpad, width=width)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            vol_spec(base + 2 * r),                      # lead add
            vol_spec(base - 1),                          # shared mid
            vol_spec(base - 2 * r - 2),                  # lag sub
            pl_spec(base + 2 * r),                       # g for lead add
            pl_spec(base + r),                           # lead a,b planes
            pl_spec(base),                               # output g
            pl_spec(base - 1),                           # g for mid
            pl_spec(base - r - 1),                       # lag a,b planes
            pl_spec(base - 2 * r - 2),                   # g for lag sub
            pd_spec(base + r),
            pd_spec(base - r - 1),
            pl.BlockSpec((wp, 3 * max_disp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, width, max_disp),
            lambda i: (jnp.maximum(i - 3 * r, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width, max_disp), storage),
        scratch_shapes=[
            pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),  # lead sums
            pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),  # lag sums
            pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),  # A2/B2
        ],
        interpret=interpret,
    )(p0p, p0p, p0p, planes, planes, planes, planes, planes, planes,
      pd, pd, tab)
    return out


def fused_wedge_fits(height: int, width: int, max_disp: int,
                     radius: int) -> bool:
    """VMEM gate for the fused kernel (12 MB working-set budget, same
    convention as ops/sgm_pallas.py): three [WP, 2D] f32 running-sum
    scratches, three double-buffered volume-row views, the packed
    constant table and the output block.  HD-class geometries
    (1024x1280 D=256: ~23 MB) fall back to the XLA wedge path."""
    r = int(radius)
    rpad = _pad_to(r, 8)
    wp = _pad_to(rpad + width + 2 * r, 8)
    d = max(max_disp, 128)              # lane padding
    bytes_needed = (3 * wp * 2 * d * 4          # running-sum scratch
                    + 6 * wp * d * 4            # vol views, double-buffered
                    + wp * 3 * d * 4            # constant table
                    + 2 * width * d * 4)        # output block
    return bytes_needed <= 12 * 1024 * 1024
