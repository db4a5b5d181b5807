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
  row t needs.
* **W boxes are unmasked roll chains**: the volume is pre-padded with
  ``rpad`` zero columns left and enough zero columns right that a
  doubling chain of ``pltpu.roll`` shifts computes the clipped
  symmetric box with no per-shift masks (wrap-around garbage lands
  only in never-read pad columns).  Measured on chip the chains are
  nearly free — sublane rolls + adds on resident rows; the kernel's
  cost is per-step structural overhead.
* **Round 5: a VMEM ring buffer replaces most grid refs.**  Round 4
  measured the delivered kernel at ~2.4x its own core loop and named
  PER-REF grid bookkeeping as the driver (packing 21 refs to 13 was
  worth 1.1 ms; the roll chains are ~free).  Each input row is now
  read from HBM ONCE through a single fresh-row ref per array and
  written into a ring of the last 4r+3 rows (``pl.ds`` dynamic slot =
  row mod ring size); the lagging taps (rows t-1, t-2r-2 for the
  running sums, t+r / t-r-1 / t for the model planes) read the ring
  instead of carrying their own refs.  5 refs total (volume, packed
  planes, per-disparity columns, constant table, output) vs round 4's
  13 — and the volume crosses HBM once instead of three times.  A
  ``rows_per_step`` knob amortizes the remaining per-step overhead
  over k output rows per grid step (all intra-step offsets are Python
  constants, so the unrolled sub-steps cost no dynamic control flow).
* **All wedge quantities are closed-form or plane inputs**: validity
  and window counts depend only on (x, d) and the row index, and the
  masked guide statistics arrive as the same prefix planes the XLA
  wedge path uses (ops/cvf.py::_prefix_planes_w), reconstructed per
  row with one select.
* **Warm-up costs no branches**: the grid starts 3r steps early and the
  ring/sums zero-init at step 0; rows outside the image are zero (ring
  slots never written stay zero, matching the old zero pad rows), and
  the linear models of out-of-image rows are gated to zero (an
  out-of-image row within r of the boundary has nonzero clipped
  p-statistics but zero guide-plane rows — ungated, cov/(0+eps)
  explodes; gated, the clipped stage-2 H-box semantics fall out
  exactly).  Early output writes land on block 0 and are overwritten
  by the real rows.

Semantics match ``guided_filter_aggregate(..., wedge_offset=k)`` up to
floating-point association (same masked means, different summation
order); tests compare against the XLA wedge path and the shared
oracle.  bf16 volumes stream in storage dtype (including the ring) and
compute f32.
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


def _fused_wedge_ring_kernel(*refs,
                             radius: int, eps: float, height: int,
                             width_padded: int, rpad: int, width: int,
                             rows_per_step: int, volume_ring: bool,
                             chunked: bool = False,
                             raw_volume: bool = False):
    """Grid step i covers output rows t = i*k - 3r + j, j in [0, k).

    Per sub-row: write the fresh input row (u = t + 2r) into the rings,
    advance the lead/lag stat sums from ring taps, compute a0/b0 at
    rows t+r and t-r-1, advance A2/B2, emit row t.

    ``volume_ring`` selects where the volume's lagging taps come from: a
    (4r+3)-row VMEM ring (one HBM read per row — but the ring is
    volume-row-sized, too big for f32 teddy-class geometries next to
    the ~16 MB VMEM: measured 17.85 MB scoped), or two extra HBM refs
    at the mid/lag offsets (round 4's layout for those taps; the small
    plane/pd arrays stay ringed either way).
    """
    k = rows_per_step
    if volume_ring:
        (p0_ref, pl_ref, pd_ref, tab_ref, out_ref,
         ring_p0, ring_pl, ring_pd, slead_ref, slag_ref, s2_ref) = refs
        fresh_refs = mid_refs = lag_refs = None
    else:
        fresh_refs = refs[:k]
        mid_refs = refs[k:2 * k]
        lag_refs = refs[2 * k:3 * k]
        (pl_ref, pd_ref, tab_ref, out_ref,
         ring_pl, ring_pd, slead_ref, slag_ref, s2_ref) = refs[3 * k:]
        ring_p0 = None
    # Chunked (W-split) layout: grid (n_chunks, n_row_steps), every ref
    # carries a leading chunk dim of block size 1 (pd/out excepted);
    # state resets at each chunk's row step 0.
    i = pl.program_id(1) if chunked else pl.program_id(0)
    r = radius
    ring_n = 4 * r + 3

    def vol_row(ref, j):
        return ref[0, 0] if chunked else ref[j]

    def vol_tap(ref, j, u):
        """Volume-row view for the tap at original row ``u``.

        ``raw_volume`` (round 5): the refs read the UNPADDED volume
        through clamped index maps, so the kernel pads the columns,
        applies the wedge/width mask (validf) and the row gate itself —
        the XLA prep then never copies the volume (the padded+masked
        copy was a full extra HBM round trip).
        """
        row = vol_row(ref, j)
        if not raw_volume:
            return row
        padded = jnp.pad(row.astype(jnp.float32),
                         ((rpad, width_padded - rpad - width), (0, 0)))
        rv = jnp.where((u >= 0) & (u < height), 1.0, 0.0)
        # where, not multiply: the wedge cells are +inf and inf*0 = NaN.
        return jnp.where((validf * rv) > 0, padded, 0.0)

    @pl.when(i == 0)
    def _init():
        if ring_p0 is not None:
            ring_p0[...] = jnp.zeros_like(ring_p0)
        ring_pl[...] = jnp.zeros_like(ring_pl)
        ring_pd[...] = jnp.zeros_like(ring_pd)
        slead_ref[...] = jnp.zeros_like(slead_ref)
        slag_ref[...] = jnp.zeros_like(slag_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    tab = tab_ref[0] if chunked else tab_ref[...]      # [WP, 3D]
    d = tab.shape[1] // 3
    validf = tab[:, :d]
    cntw = tab[:, d:2 * d]
    condf = tab[:, 2 * d:]

    def stat_rows(p, g_col):
        # Both statistics ride ONE roll chain, stacked on the lane axis
        # ([WP, 2D]): sublane rolls never mix lanes.
        p = p.astype(jnp.float32)                      # [WP, D]
        stacked = jnp.concatenate([p, g_col * p], axis=1)   # [WP, 2D]
        return _wbox_rolls(stacked, r, width_padded)

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

    for j in range(k):
        s = i * k + j                 # fresh padded row index (= u + r)
        t = s - 3 * r                 # output row this sub-step emits

        # Ring slots: slot(u) = u mod ring_n with u = s - c; the +ring_n
        # multiples keep lax.rem's operand non-negative.
        def slot(c):
            mult = -(-c // ring_n) * ring_n          # ceil to ring_n
            return lax.rem(s + (mult - c), ring_n)

        p_fresh = (p0_ref[j] if ring_p0 is not None
                   else vol_tap(fresh_refs[j], 0, t + 2 * r))  # [WP, D]
        plf = (pl_ref[0, j] if chunked
               else pl_ref[j]).astype(jnp.float32)     # [WP, 8]
        pdf = pd_ref[j]                                # [2, D]
        s_f = slot(r)                                  # u = t + 2r
        if ring_p0 is not None:
            ring_p0[pl.ds(s_f, 1)] = p_fresh[None]
        ring_pl[pl.ds(s_f, 1)] = plf[None]
        ring_pd[pl.ds(s_f, 1)] = pdf[None]

        def tap_pl(c):
            return ring_pl[pl.ds(slot(c), 1)][0]
        if ring_p0 is not None:
            p_mid = ring_p0[pl.ds(slot(3 * r + 1), 1)][0]   # u = t - 1
            p_lag = ring_p0[pl.ds(slot(5 * r + 2), 1)][0]   # u = t-2r-2
        else:
            p_mid = vol_tap(mid_refs[j], 0, t - 1)
            p_lag = vol_tap(lag_refs[j], 0, t - 2 * r - 2)
        pl_mid = tap_pl(3 * r + 1)
        pl_lag = tap_pl(5 * r + 2)

        add_s = stat_rows(p_fresh, plf[:, 0:1])
        mid_s = stat_rows(p_mid, pl_mid[:, 0:1])
        lag_s = stat_rows(p_lag, pl_lag[:, 0:1])
        slead_ref[0] = slead_ref[0] + add_s - mid_s
        slag_ref[0] = slag_ref[0] + mid_s - lag_s

        pd_lead = ring_pd[pl.ds(slot(2 * r), 1)][0]    # u = t + r
        pd_lag = ring_pd[pl.ds(slot(4 * r + 1), 1)][0]  # u = t - r - 1
        ab_lead = ab_row(slead_ref[0], tap_pl(2 * r), pd_lead, t + r)
        ab_lag = ab_row(slag_ref[0], tap_pl(4 * r + 1), pd_lag, t - r - 1)
        s2_ref[0] = s2_ref[0] + ab_lead - ab_lag

        # Output row t: q = (boxW(A2) * g + boxW(B2)) / count; invalid
        # cells restored to +inf.
        boxed = _wbox_rolls(s2_ref[0], r, width_padded)
        count_t = jnp.maximum(count_h(t) * cntw, 1.0)
        g_t = tap_pl(3 * r)[:, 0:1]                    # u = t
        q = (boxed[:, :d] * g_t + boxed[:, d:]) / count_t
        q = jnp.where(validf > 0, q, jnp.float32(jnp.inf))
        out_ref[j] = q[rpad:rpad + width].astype(out_ref.dtype)


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


# Scoped-VMEM ceiling: the hardware limit is 16 MB; estimates carry the
# terms calibrated against the compiler's scoped-allocation reports at
# teddy (benchmarks/cvf_ring_probe_r5 runs): kernel temporaries are
# ~5 MB PER UNROLLED SUB-STEP (the roll-chain/ab intermediates of
# different j do not share stack slots — refs k=2 f32 reported 20.1 MB
# vs k=1's ~10), and VMEM scratch is allocated UNPACKED (a bf16 volume
# ring costs f32 bytes: ring bf16 k=1 reported 17.74 vs f32's 17.85).
_VMEM_CEILING = 15 * 1024 * 1024


def _ring_vmem_bytes(height: int, width: int, max_disp: int, radius: int,
                     rows_per_step: int, itemsize: int,
                     volume_ring: bool = True) -> int:
    """Scoped-VMEM estimate for the kernel (see _VMEM_CEILING)."""
    r = int(radius)
    rpad = _pad_to(r, 8)
    wp = _pad_to(rpad + width + 2 * r, 8)
    d = max(max_disp, 128)              # lane padding
    ring_n = 4 * r + 3
    k = rows_per_step
    vol_rows = 1 if volume_ring else 3          # fresh (+ mid/lag refs)
    return ((ring_n * wp * d * 4 if volume_ring else 0)  # ring: unpacked
            + ring_n * wp * _PL_LANES * 4       # plane ring
            + ring_n * 2 * d * 4                # pd ring
            + 3 * wp * 2 * d * 4                # running-sum scratch
            + 2 * wp * 3 * d * 4                # constant table (dbl-buf)
            + 2 * k * vol_rows * wp * d * itemsize  # volume blocks, dbl-buf
            + 2 * k * wp * _PL_LANES * 4        # plane block
            + 2 * k * width * d * itemsize      # output block
            + k * 12 * wp * 2 * d * 4)          # temporaries, per sub-step


def _pick_layout(height: int, width: int, max_disp: int,
                 radius: int, itemsize: int):
    """(volume_ring, rows_per_step) that fits the VMEM ceiling.

    Auto stays at k = 1 — the only teddy-class configuration validated
    on chip (benchmarks/cvf_ring_probe_r5: every k > 1 layout and every
    teddy ring layout blew the 16 MB scoped-VMEM limit; temporaries
    scale with the unroll).  The ring is preferred when it clearly
    fits (small geometries: one HBM read of the volume instead of
    three); k > 1 remains available through the explicit
    ``rows_per_step`` argument for future probing."""
    if _ring_vmem_bytes(height, width, max_disp, radius, 1,
                        itemsize, True) <= _VMEM_CEILING:
        return True, 1
    return False, 1


@functools.partial(jax.jit, static_argnames=("radius", "eps",
                                             "wedge_offset", "interpret",
                                             "rows_per_step",
                                             "volume_ring", "raw_volume"))
def guided_filter_wedge_pallas(cost_volume: jnp.ndarray,
                               guide: jnp.ndarray, *,
                               radius: int = 8, eps: float = 1e-4,
                               wedge_offset: int = 0,
                               interpret: bool = False,
                               rows_per_step: int | None = None,
                               volume_ring: bool | None = None,
                               raw_volume: bool | None = None
                               ) -> jnp.ndarray:
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
    if volume_ring is None and rows_per_step is None:
        volume_ring, rows_per_step = _pick_layout(
            height, width, max_disp, r, jnp.dtype(storage).itemsize)
    elif volume_ring is None:
        volume_ring = _ring_vmem_bytes(
            height, width, max_disp, r, int(rows_per_step),
            jnp.dtype(storage).itemsize, True) <= _VMEM_CEILING
    elif rows_per_step is None:
        rows_per_step = 1
    k_rows = int(rows_per_step)
    if (3 * r) % k_rows:
        raise ValueError(f"rows_per_step {k_rows} must divide 3*radius "
                         f"= {3 * r} (output-block alignment)")
    # raw_volume (round 5): skip the padded+masked volume copy in the
    # XLA prep — the refs-layout kernel reads the raw volume through
    # clamped index maps and pads/masks in VMEM.  Default ON for the
    # refs layout (the benchmark geometries); the ring layout keeps the
    # padded copy (its ring stores pre-masked rows).
    if raw_volume is None:
        raw_volume = not volume_ring and k_rows == 1
    if raw_volume and (volume_ring or k_rows != 1):
        raise ValueError("raw_volume requires the refs layout at "
                         "rows_per_step=1")

    # ---- XLA preparation (plane passes + padded copies) -------------
    p32 = cost_volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    if not raw_volume:
        x_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 0)
        d_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1) + off
        valid_wd = x_id >= d_id
        p0 = jnp.where(valid_wd[None], p32, 0.0).astype(storage)

    # Column padding: rpad zero columns left (multiple of 8 so the
    # output slice stays sublane-aligned), right shelter >= 2r.
    rpad = _pad_to(r, 8)
    wp = _pad_to(rpad + width + 2 * r, 8)
    # Row padding: with the volume ring only the fresh tap reads HBM
    # (u = t + 2r from t = -3r: top pad r); the 3-ref layout's lag tap
    # reads back to u = t - 2r - 2 (top pad 5r + 2).
    h_out = _pad_to(height, k_rows)
    # Refs layout: lag tap reads back to u = t - 2r - 2 (top >= 5r + 2),
    # rounded so the fresh planes BLOCK offset (top - r) stays a
    # multiple of k (the per-row volume refs use stride-k index maps
    # and need no alignment at all).
    top = (r if volume_ring
           else 5 * r + 2 + ((-(4 * r + 2)) % k_rows))
    bottom = (h_out - height) + 2 * r + k_rows

    def pad_rows_cols(x):
        return jnp.pad(x, ((top, bottom), (rpad, wp - rpad - width))
                       + ((0, 0),) * (x.ndim - 2))

    p0p = cost_volume if raw_volume else pad_rows_cols(p0)

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

    # Per-disparity prefix columns, packed [H', 2, D] (edge-clamped
    # exactly like the XLA wedge path's contiguous slice).
    lo_col = max(0, min(off, width))
    overrun = max(0, lo_col + max_disp - (width + 1))
    p1e = jnp.pad(p1, ((0, 0), (0, overrun)), mode="edge")
    p2e = jnp.pad(p2, ((0, 0), (0, overrun)), mode="edge")
    pd = jnp.stack(
        [lax.slice_in_dim(p1e, lo_col, lo_col + max_disp, axis=1),
         lax.slice_in_dim(p2e, lo_col, lo_col + max_disp, axis=1)], axis=1)
    pd = jnp.pad(pd, ((top, bottom), (0, 0), (0, 0)))      # [H', 2, D]

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
    n_steps = (h_out + 3 * r) // k_rows
    warm = (3 * r) // k_rows
    ring_n = 4 * r + 3
    # Padded row of the fresh tap at grid step i is i*k + top - r; the
    # 3-ref layout adds mid (u = t - 1) and lag (u = t - 2r - 2) refs.
    fresh_ofs = (top - r) // k_rows
    kernel = functools.partial(
        _fused_wedge_ring_kernel, radius=r, eps=float(eps), height=height,
        width_padded=wp, rpad=rpad, width=width, rows_per_step=k_rows,
        volume_ring=volume_ring, raw_volume=raw_volume)
    if volume_ring:
        in_specs = [pl.BlockSpec(
            (k_rows, wp, max_disp), lambda i: (i + fresh_ofs, 0, 0),
            memory_space=pltpu.VMEM)]                      # fresh volume
        operands = [p0p]
    elif raw_volume:
        # Clamped single-row maps over the RAW volume; the kernel pads,
        # masks and row-gates (clamp-read rows outside the image are
        # gated to zero, so any content is fine).
        raw_spec = lambda c: pl.BlockSpec(
            (1, width, max_disp),
            lambda i, c=c: (jnp.clip(i + c, 0, height - 1), 0, 0),
            memory_space=pltpu.VMEM)
        in_specs = [raw_spec(-r),                       # fresh u = t+2r
                    raw_spec(-3 * r - 1),               # mid   u = t-1
                    raw_spec(-5 * r - 2)]               # lag   u = t-2r-2
        operands = [p0p] * 3
    else:
        # Per-row stride-k refs for each volume tap (fresh / mid / lag):
        # a 1-row block whose index map advances k rows per grid step —
        # index maps take any stride, so the tap offsets (which differ
        # by 2r + 1, never k-aligned) need no alignment tricks.
        row_spec = lambda c: pl.BlockSpec(
            (1, wp, max_disp), lambda i, c=c: (i * k_rows + c, 0, 0),
            memory_space=pltpu.VMEM)
        consts = ([top - r + j for j in range(k_rows)]          # fresh
                  + [top - 3 * r - 1 + j for j in range(k_rows)]  # mid
                  + [top - 5 * r - 2 + j for j in range(k_rows)])  # lag
        in_specs = [row_spec(c) for c in consts]
        operands = [p0p] * (3 * k_rows)
    in_specs += [
        pl.BlockSpec((k_rows, wp, _PL_LANES),
                     lambda i: (i + fresh_ofs, 0, 0),
                     memory_space=pltpu.VMEM),             # fresh planes
        pl.BlockSpec((k_rows, 2, max_disp),
                     lambda i: (i + fresh_ofs, 0, 0),
                     memory_space=pltpu.VMEM),             # fresh pd
        pl.BlockSpec((wp, 3 * max_disp), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),             # constant table
    ]
    operands += [planes, pd, tab]
    scratch = ([pltpu.VMEM((ring_n, wp, max_disp), storage)]
               if volume_ring else [])
    scratch += [
        pltpu.VMEM((ring_n, wp, _PL_LANES), jnp.float32),  # plane ring
        pltpu.VMEM((ring_n, 2, max_disp), jnp.float32),    # pd ring
        pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),    # lead sums
        pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),    # lag sums
        pltpu.VMEM((1, wp, 2 * max_disp), jnp.float32),    # A2/B2
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (k_rows, width, max_disp),
            lambda i: (jnp.maximum(i - warm, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_out, width, max_disp), storage),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return out[:height] if h_out != height else out


def fused_wedge_fits(height: int, width: int, max_disp: int,
                     radius: int, itemsize: int = 4) -> bool:
    """VMEM gate for the fused kernel: True when EITHER layout (volume
    ring, or the 3-ref volume fallback) fits the calibrated scoped-VMEM
    ceiling.  HD-class geometries (1024x1280 D=256) fit neither
    full-width and fall back to the XLA wedge path (or the W-chunked
    HD kernel)."""
    return (_ring_vmem_bytes(height, width, max_disp, radius, 1,
                             itemsize, True) <= _VMEM_CEILING
            or _ring_vmem_bytes(height, width, max_disp, radius, 1,
                                itemsize, False) <= _VMEM_CEILING)


def _chunk_vmem_bytes(chunk_width: int, max_disp: int, radius: int,
                      itemsize: int) -> int:
    """Per-chunk scoped-VMEM estimate for the W-chunked kernel (refs
    layout, k = 1), same calibrated terms as _ring_vmem_bytes."""
    r = int(radius)
    left = _pad_to(2 * r, 8)
    wcp = left + chunk_width + 4 * r
    d = max(max_disp, 128)
    ring_n = 4 * r + 3
    return (ring_n * wcp * _PL_LANES * 4        # plane ring
            + ring_n * 2 * d * 4                # pd ring
            + 3 * wcp * 2 * d * 4               # running-sum scratch
            + 2 * wcp * 3 * d * 4               # per-chunk table (dbl-buf)
            + 2 * 3 * wcp * d * itemsize        # volume row blocks
            + 2 * wcp * _PL_LANES * 4           # plane block
            + 2 * chunk_width * d * itemsize    # output block
            + 12 * wcp * 2 * d * 4)             # kernel temporaries


def pick_chunk_width(width: int, max_disp: int, radius: int,
                     itemsize: int):
    """Chunk width for the W-chunked kernel; None when even 64 columns
    do not fit (give up on the chunked kernel).

    Preference (chip-measured at HD, cvf_wc sweep r5): an EXACT divisor
    of the width up to 256 — ragged last chunks waste columns and wider
    chunks pay VMEM pressure (bf16 HD: wc 256 = 26.98 ms vs 320 =
    28.65, 288 = 29.33) — then the largest fitting multiple of 8."""
    best_div = None
    wc = min(_pad_to(width, 8), 256)
    while wc >= 64:
        if (_chunk_vmem_bytes(wc, max_disp, radius, itemsize)
                <= _VMEM_CEILING):
            if width % wc == 0:
                return wc
            if best_div is None:
                best_div = wc            # largest fitting, ragged
        wc -= 8
    return best_div


@functools.partial(jax.jit, static_argnames=("radius", "eps",
                                             "wedge_offset", "interpret",
                                             "chunk_width"))
def guided_filter_wedge_chunked_pallas(cost_volume: jnp.ndarray,
                                       guide: jnp.ndarray, *,
                                       radius: int = 8, eps: float = 1e-4,
                                       wedge_offset: int = 0,
                                       interpret: bool = False,
                                       chunk_width: int | None = None
                                       ) -> jnp.ndarray:
    """W-chunked fused wedge CVF for geometries whose full-width state
    cannot fit VMEM (HD: W=1280, D=256 needs ~2.7 MB per running-sum row
    — x3 sums + temporaries blows the 16 MB budget).

    The column axis splits into chunks processed as the OUTER grid dim;
    each chunk runs the same streaming row sweep as the full-width
    kernel over a [left | wc | 2r halo | 2r shelter] column window:

    * output columns need ab models up to r past the chunk, whose stat
      sums reach r further — so 2r REAL halo columns each side (zeros
      at the true image edges, where windows clip);
    * the roll-chain wrap garbage lands in the 2r shelter, and the
      re-center roll's front garbage stays inside the first r of the
      left pad — never read, exactly as in the full-width layout;
    * per-chunk (x, d) tables carry GLOBAL column indices, so validity,
      counts and the prefix-plane selector are unchanged; A2/B2
      accumulate ab of in-image halo columns (gated only by the global
      wedge/width mask) — the cross-chunk coupling the halos exist for.

    Redundant compute is (left + 4r) / wc per chunk (~19% at wc = 256);
    the volume is re-read once per OWNING chunk only (halo columns ride
    the same block).  Semantics identical to the full-width kernel.
    """
    height, width, max_disp = cost_volume.shape
    r = int(radius)
    if r < 1:
        raise ValueError(f"radius must be >= 1 for the fused kernel, "
                         f"got {r}")
    off = int(wedge_offset)
    storage = cost_volume.dtype
    if chunk_width is None:
        chunk_width = pick_chunk_width(width, max_disp, r,
                                       jnp.dtype(storage).itemsize)
        if chunk_width is None:
            raise ValueError("no chunk width fits VMEM for this geometry")
    wc = int(chunk_width)
    if wc % 8:
        raise ValueError(f"chunk_width must be a multiple of 8, got {wc}")

    left = _pad_to(2 * r, 8)
    wcp = left + wc + 4 * r
    n_chunks = -(-width // wc)
    w_total = n_chunks * wc

    # ---- XLA preparation --------------------------------------------
    p32 = cost_volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    x_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 0)
    d_id = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1) + off
    valid_wd = x_id >= d_id
    p0 = jnp.where(valid_wd[None], p32, 0.0).astype(storage)

    top = 5 * r + 2                      # refs-layout lag reach
    bottom = 2 * r + 1

    def pad_and_chunk(x):
        """Row pad + column pad, then the per-chunk column windows
        [j*wc, j*wc + wcp) stacked on a leading chunk axis."""
        xp = jnp.pad(x, ((top, bottom),
                         (left, w_total - width + 4 * r))
                     + ((0, 0),) * (x.ndim - 2))
        return jnp.stack([xp[:, j * wc:j * wc + wcp]
                          for j in range(n_chunks)])

    p0c = pad_and_chunk(p0)                       # [J, Hp, WCP, D]

    g1 = _box_sum_sym(i32, r, axes=(0,))
    g2 = _box_sum_sym(i32 * i32, r, axes=(0,))
    hi1, lo1, p1 = _prefix_planes_w(g1, r)
    hi2, lo2, p2 = _prefix_planes_w(g2, r)
    planes = jnp.stack([i32, hi1, lo1, hi2, lo2]
                       + [jnp.zeros_like(i32)] * (_PL_LANES - 5), axis=-1)
    planes_c = pad_and_chunk(planes)              # [J, Hp, WCP, 8]

    lo_col = max(0, min(off, width))
    overrun = max(0, lo_col + max_disp - (width + 1))
    p1e = jnp.pad(p1, ((0, 0), (0, overrun)), mode="edge")
    p2e = jnp.pad(p2, ((0, 0), (0, overrun)), mode="edge")
    pd = jnp.stack(
        [lax.slice_in_dim(p1e, lo_col, lo_col + max_disp, axis=1),
         lax.slice_in_dim(p2e, lo_col, lo_col + max_disp, axis=1)], axis=1)
    pd = jnp.pad(pd, ((top, bottom), (0, 0), (0, 0)))   # [Hp, 2, D]

    # Per-chunk (x, d) tables in GLOBAL column coordinates.
    l_id = lax.broadcasted_iota(jnp.int32, (n_chunks, wcp, max_disp), 1)
    j_id = lax.broadcasted_iota(jnp.int32, (n_chunks, wcp, max_disp), 0)
    xg = j_id * wc + l_id - left
    dg = lax.broadcasted_iota(jnp.int32, (n_chunks, wcp, max_disp), 2) + off
    validf = ((xg >= dg) & (xg >= 0) & (xg < width)).astype(jnp.float32)
    cntw = jnp.maximum(
        jnp.minimum(xg + r, width - 1)
        - jnp.maximum(jnp.maximum(xg - r, 0), dg) + 1, 0
    ).astype(jnp.float32)
    condf = ((xg - r) >= dg).astype(jnp.float32)
    tab = jnp.concatenate([validf, cntw, condf], axis=2)   # [J, WCP, 3D]

    # ---- pallas call ------------------------------------------------
    n_steps = height + 3 * r
    warm = 3 * r
    ring_n = 4 * r + 3
    kernel = functools.partial(
        _fused_wedge_ring_kernel, radius=r, eps=float(eps), height=height,
        width_padded=wcp, rpad=left, width=wc, rows_per_step=1,
        volume_ring=False, chunked=True)
    vol_spec = lambda c: pl.BlockSpec(
        (1, 1, wcp, max_disp), lambda j, i, c=c: (j, i + c, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks, n_steps),
        in_specs=[
            vol_spec(4 * r + 2),                           # fresh
            vol_spec(2 * r + 1),                           # mid
            vol_spec(0),                                   # lag
            pl.BlockSpec((1, 1, wcp, _PL_LANES),
                         lambda j, i: (j, i + 4 * r + 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, max_disp),
                         lambda j, i: (i + 4 * r + 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wcp, 3 * max_disp),
                         lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, wc, max_disp),
            lambda j, i: (jnp.maximum(i - warm, 0), j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, w_total, max_disp),
                                       storage),
        scratch_shapes=[
            pltpu.VMEM((ring_n, wcp, _PL_LANES), jnp.float32),
            pltpu.VMEM((ring_n, 2, max_disp), jnp.float32),
            pltpu.VMEM((1, wcp, 2 * max_disp), jnp.float32),
            pltpu.VMEM((1, wcp, 2 * max_disp), jnp.float32),
            pltpu.VMEM((1, wcp, 2 * max_disp), jnp.float32),
        ],
        interpret=interpret,
    )(p0c, p0c, p0c, planes_c, pd, tab)
    return out[:, :width] if w_total != width else out
