"""Streaming Pallas SSD / SAD cost kernels — one HBM pass per volume.

The XLA formulation (ops/cost.py: gather + two separable ``reduce_window``
passes) is the semantic oracle, but it materializes the [H, W, D] volume
several times in HBM.  This kernel streams the image rows once and writes
the cost volume once — every intermediate lives in VMEM:

* the grid runs over blocks of R output rows (R the largest divisor of H
  up to 8, amortizing per-step grid overhead); both images stay
  VMEM-resident ([1, H, W], ~1 MB each) and rows are read with dynamic
  sublane slices;
* in-kernel layout is [D, W] — disparity on *sublanes*, width on *lanes* —
  so the shifted stack R[w - d] is built with log2(D) lane-rolls selected
  by per-step disparity-bit masks (no gather), and the 2k-tap horizontal
  window sum (half-open [w - k, w + k), reference ``src/ssd.cu:37-42``)
  is a doubling tree of lane-rolls over a k-zero-padded row buffer
  (wrapped lanes land only where w < d, which the validity mask kills);
* a [2k, D, W] VMEM ring holds the horizontal window sums of the last 2k
  rows.  The vertical window sum is anchored fresh at each block's first
  row (a full static-order sum over the ring) and advanced incrementally
  for the other R - 1 rows (+ entering row - leaving row, the slot the
  push just evicted), then transposed to [W, D], masked to +inf / int-max
  where d > w, and written out.

Exactness: the integer chain (uint8/int16 inputs, int32 cost) is
bit-identical to the XLA kernel (integer addition is associative).  The
float chain differs from ``reduce_window`` in summation order and by the
in-block running-sum update — non-negative summands, re-anchored every R
rows, so the drift is a few ulps; tests pin a 1e-6 relative bound and
exact +inf placement.

Reference semantics: CostOps::ComputeSSD, src/ssd.cu:15-81 (clipped
half-open windows, +inf where d > col); the SAD variant shares the window
semantics with an L1 summand (beyond the reference's surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Working-set ceiling, aligned with ops/sgm_pallas.py's budgeting of the
# ~16 MB/core VMEM.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _padded_bytes(sub: int, lane: int, itemsize: int = 4) -> int:
    """VMEM bytes of a [sub, lane] tile-padded f32/int32 buffer."""
    return ((sub + 7) // 8 * 8) * ((lane + 127) // 128 * 128) * itemsize


def _rows_per_step(height: int) -> int:
    """Largest divisor of H in [1, 8] — the output block height."""
    for r in (8, 7, 6, 5, 4, 3, 2):
        if height % r == 0:
            return r
    return 1


def ssd_pallas_supported(height: int, width: int, max_disparity: int,
                         kernel_size: int) -> bool:
    """True when the streaming kernel's working set fits the VMEM budget:
    ring (2k rows) + ~6 row-sized vector temporaries + the resident images
    + the double-buffered [R, W, D] output block.  Callers fall back to
    the XLA formulation otherwise."""
    if height < 1 or width < 1:
        return False
    k = kernel_size
    row_dw = _padded_bytes(max_disparity, width + 2 * k)
    out_wd = _padded_bytes(width, max_disparity)
    img = _padded_bytes(height, width)
    r = _rows_per_step(height)
    total = (2 * k + 6) * row_dw + 2 * r * out_wd + 2 * img
    return total <= _VMEM_BUDGET_BYTES


def ssd_pallas_preferred(height: int, width: int, max_disparity: int,
                         kernel_size: int) -> bool:
    """True where the streaming kernel beats the XLA formulation on TPU.

    The kernel is VPU-bound: its per-row cost scales with the [D, W]
    vector-register footprint (the log2(D) shifted-stack build dominates),
    while the XLA path is HBM-bound on ~4 volume passes.  Measured on a
    v5e chip (benchmarks/ssd_pallas_probe.py):

      512x256 D=32:  0.19 vs 0.62 ms  -> 3.3x win
      375x384 D=64:  0.54 vs 0.65 ms  -> win       (W % 128 == 0)
      375x512 D=64:  0.61 vs 0.83 ms  -> win       (W % 128 == 0)
      375x448 D=64:  0.98 vs 0.80 ms  -> loss      (W % 128 != 0)
      375x450 D=128: 1.40 vs 0.95 ms  -> loss

    Two measured discriminators: lane alignment (W a multiple of 128 —
    unaligned widths push every roll/store through masked edge handling)
    and D <= 64 (the shifted-stack build's per-row op count doubles with
    each disparity octave while XLA's traffic is D-linear).
    """
    return (max_disparity <= 64 and width % 128 == 0
            and ssd_pallas_supported(height, width, max_disparity,
                                     kernel_size))


def _compute_dtype(cost_dtype):
    cost_dtype = jnp.dtype(cost_dtype)
    if jnp.issubdtype(cost_dtype, jnp.floating):
        return jnp.float32
    return jnp.int32


def _fill_value(dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype)


def _cost_kernel(left_ref, right_ref, out_ref, ring_ref, *,
                 height: int, width: int, max_disp: int, kernel_size: int,
                 rows_per_step: int, absolute: bool):
    t = pl.program_id(0)
    k = kernel_size
    m = 2 * k
    cdt = ring_ref.dtype
    zero = jnp.zeros((), cdt)

    # Per-step constants, shared by every row this block touches.
    d_iota = lax.broadcasted_iota(jnp.int32, (max_disp, width), 0)
    w_iota = lax.broadcasted_iota(jnp.int32, (max_disp, width), 1)
    valid_dw = w_iota >= d_iota
    bit_masks = []
    bit = 1
    while bit < max_disp:
        bit_masks.append((bit, (d_iota & bit) != 0))
        bit *= 2

    def _row_window_sums(j):
        """[D, W] horizontal 2k-window sums of image row j (traced)."""
        lrow = jnp.broadcast_to(left_ref[0, pl.ds(j, 1), :],
                                (max_disp, width))
        v = jnp.broadcast_to(right_ref[0, pl.ds(j, 1), :],
                             (max_disp, width))
        # v[d, w] <- R[w - d] via one lane-roll + select per disparity
        # bit.  For valid cells (w >= d) every partial source index
        # w - (d mod 2^b) stays >= 0, so wraparound only feeds cells the
        # validity mask zeroes.
        for bit, take in bit_masks:
            v = jnp.where(take, pltpu.roll(v, bit, axis=1), v)
        diff = lrow - v
        term = jnp.abs(diff) if absolute else diff * diff
        term = jnp.where(valid_dw, term, zero)

        # Zero-pad k lanes each side: out-of-image columns contribute the
        # additive identity, which IS the reference's window clipping for
        # a non-negative summand (ssd.cu:37-42).
        buf = jnp.pad(term, ((0, 0), (k, k)))          # [D, W + 2k]
        wp = width + 2 * k

        # Doubling tree of forward-window sums S_b[w] = sum_{j<b}
        # buf[w+j]; composed reads stay below the wrap boundary for every
        # offset (max index W - 1 + 2k - 1 < W + 2k).
        blocks = {1: buf}
        b = 1
        while 2 * b <= m:
            blocks[2 * b] = blocks[b] + pltpu.roll(blocks[b], (-b) % wp,
                                                   axis=1)
            b *= 2
        total = None
        off = 0
        rem = m
        while rem:
            if b <= rem:
                part = (blocks[b] if off == 0
                        else pltpu.roll(blocks[b], (-off) % wp, axis=1))
                total = part if total is None else total + part
                off += b
                rem -= b
            b //= 2
        # hsum[w] = sum_{c in [w-k, w+k)} term[c] = total[w] (the buffer
        # offset k cancels the window's lower extent).
        return total[:, :width]

    @pl.when(t == 0)
    def _prologue():
        # Rows 0..k-2 pre-fill the ring; unwritten slots (negative and
        # out-of-image rows) stay zero — the clipped-window identity.
        ring_ref[...] = jnp.zeros((m, max_disp, width), cdt)
        for r in range(min(k - 1, height)):
            ring_ref[pl.ds(r % m, 1)] = _row_window_sums(r)[None]

    lane_d = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1)
    sub_w = lax.broadcasted_iota(jnp.int32, (width, max_disp), 0)
    valid_wd = sub_w >= lane_d
    fill = _fill_value(out_ref.dtype)

    vsum = None
    for r_local in range(rows_per_step):
        o = t * rows_per_step + r_local          # output row (traced)
        j = o + k - 1                            # entering window row
        new = _row_window_sums(jnp.minimum(j, height - 1))
        new = jnp.where(j < height, new, zero)   # below-image rows are 0
        slot = lax.rem(j, m)
        old = ring_ref[pl.ds(slot, 1)][0]        # the row leaving: j - 2k
        ring_ref[pl.ds(slot, 1)] = new[None]
        if r_local == 0:
            # Fresh anchor: full static-order ring sum (rows [o-k, o+k)).
            vsum = ring_ref[0]
            for s in range(1, m):
                vsum = vsum + ring_ref[s]
        else:
            vsum = vsum + new - old
        cost = vsum.T                             # [W, D]
        out_ref[r_local] = jnp.where(valid_wd, cost.astype(out_ref.dtype),
                                     fill)


@functools.partial(jax.jit, static_argnames=("max_disparity", "kernel_size",
                                             "cost_dtype", "absolute",
                                             "interpret"))
def diff_cost_volume_pallas(left: jnp.ndarray, right: jnp.ndarray, *,
                            max_disparity: int, kernel_size: int = 7,
                            cost_dtype=jnp.float32, absolute: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    """Windowed SSD (``absolute=False``) / SAD (``True``) cost volume.

    Drop-in for ops.cost.ssd_cost_volume / sad_cost_volume at
    ``disparity_offset=0`` on geometries where
    :func:`ssd_pallas_supported` holds.
    """
    height, width = left.shape
    k = kernel_size
    if not ssd_pallas_supported(height, width, max_disparity, k):
        raise ValueError(
            f"geometry {height}x{width} D={max_disparity} k={k} exceeds the "
            "streaming kernel's VMEM budget; use the XLA formulation")
    cdt = _compute_dtype(cost_dtype)
    rows = _rows_per_step(height)
    # [1, H, W] keeps the images whole-resident in VMEM with a
    # tile-friendly (H, W) trailing shape; rows are dynamic sublane reads.
    left_c = left.astype(cdt)[None]
    right_c = right.astype(cdt)[None]

    kernel = functools.partial(_cost_kernel, height=height, width=width,
                               max_disp=max_disparity, kernel_size=k,
                               rows_per_step=rows, absolute=absolute)
    whole = lambda t: (0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(height // rows,),
        in_specs=[
            pl.BlockSpec((1, height, width), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height, width), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, width, max_disparity),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width, max_disparity),
                                       jnp.dtype(cost_dtype)),
        scratch_shapes=[pltpu.VMEM((2 * k, max_disparity, width), cdt)],
        interpret=interpret,
    )(left_c, right_c)


def ssd_cost_volume_pallas(left, right, *, max_disparity: int,
                           kernel_size: int = 7, cost_dtype=jnp.float32,
                           interpret: bool = False) -> jnp.ndarray:
    """Streaming-Pallas SSD cost volume (see module docstring)."""
    return diff_cost_volume_pallas(left, right, max_disparity=max_disparity,
                                   kernel_size=kernel_size,
                                   cost_dtype=cost_dtype, absolute=False,
                                   interpret=interpret)


def sad_cost_volume_pallas(left, right, *, max_disparity: int,
                           kernel_size: int = 7, cost_dtype=jnp.float32,
                           interpret: bool = False) -> jnp.ndarray:
    """Streaming-Pallas SAD cost volume (see module docstring)."""
    return diff_cost_volume_pallas(left, right, max_disparity=max_disparity,
                                   kernel_size=kernel_size,
                                   cost_dtype=cost_dtype, absolute=True,
                                   interpret=interpret)
