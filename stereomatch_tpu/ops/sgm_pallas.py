"""Pallas TPU kernels for semiglobal aggregation.

The XLA `lax.scan` formulation (ops/aggregation.py) walks the volume eight
times — once per traversal — and each scan step is its own fusion.  These
kernels restructure the work around HBM traffic, the true bottleneck:

* One *pass* streams the [H, W, D] volume row by row (grid over H, one
  [1, W, D] block per step) and advances ALL path families that scan in
  that row direction simultaneously — vertical + both diagonals, i.e. 3 of
  the 4 families.  Their per-family running path costs live in a VMEM
  scratch carry [F, W, D] that persists across the sequential TPU grid,
  exactly like the CUDA kernel's shared-memory prev_cost array
  (semiglobal_gpu.cu:49-105) but for a whole row of paths at once.
* The reverse traversals are the same kernel with a reversed grid index
  map and negated diagonal shifts — no flipped copies of the volume are
  materialized.
* A pass can *accumulate* onto a partial volume in place
  (input_output_aliases), so the 6 row-direction traversals cost
  read-cost + write-partial (forward) + read-cost + read-partial +
  write-partial (reverse) of HBM traffic in total.
* The horizontal family (scan along W) has two implementations: the
  NATURAL mode (round 3 default) walks [H, cw, D] column-chunk blocks
  with a VMEM-resident [H, D] carry and accumulates in place onto the
  row-family partial — zero transpose traffic, no separate partial
  volume, no final add (measured: teddy pipeline 3.84 -> 3.25 ms);
  the TRANSPOSED mode reuses the row kernel on a swapaxes'd volume and
  remains the fallback where no column chunking fits VMEM.
* The adaptive penalty P2_adj = max(P1, P2/|dI|) (semiglobal.cpp:137-138)
  depends only on the image, not the recurrence — it is precomputed in XLA
  as an [H, W, F] map (one lane-broadcast column read per row step) instead
  of re-deriving intensities inside the kernel.

Semantics are identical to ops.aggregation.semiglobal_aggregate: same
recurrence, seeding, edge re-entry reseeds, and 8-traversal accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAMILY_SHIFTS = (0, 1, -1)      # vertical, diagonal (1,1), diagonal (-1,1)

# VMEM sizing knobs.  Production values target the ~16 MB/core budget with
# Mosaic's real overhead (~1.7x naive buffer arithmetic, measured at HD);
# tests override them to force every large-geometry adaptation —
# w_chunks > 1, mask_scratch off, per-family passes — at toy shapes,
# where interpret mode can assert bit-parity with the unchunked kernel.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024      # _pick_rows_per_step ceiling
_MASK_CACHE_MAX_BYTES = 2 * 1024 * 1024    # 2-row edge-mask scratch cache
_WCHUNK_TARGET_BYTES = 512 * 1024          # live-temporary bound per chunk
_WGRID_BUDGET_BYTES = 8 * 1024 * 1024      # W-on-grid mode working set cap


def _row_vmem_bytes(width: int, max_disp: int) -> int:
    """VMEM bytes one [W, D] f32 row really occupies: the trailing two
    dims tile as (8 sublanes, 128 lanes), so W pads to a multiple of 8
    and D to a multiple of 128.  Modeling the unpadded product
    under-counts 2x at D=64 (seen OOM: coarse pyramid level 256x320x64
    picked 16-row blocks and blew scoped VMEM by 3%)."""
    return ((width + 7) // 8 * 8) * ((max_disp + 127) // 128 * 128) * 4


def _shift2d(image: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Zero-filled 2-D shift: out[r, x] = image[r - rows, x - cols].

    Sign-mirrored view of ops.cost._shift2d_zero (one shared
    implementation; this module's callers think in predecessor offsets).
    """
    from .cost import _shift2d_zero
    return _shift2d_zero(image, -rows, -cols)


def _p2_maps(image: jnp.ndarray, penalty1: float, penalty2: float,
             shifts, reverse: bool) -> jnp.ndarray:
    """[H, W, F] adaptive-P2 maps for one traversal direction.

    Forward predecessor of (r, x) for family shift s is (r-1, x-s); reverse
    is (r+1, x+s).  Out-of-image predecessors read as 0, mirroring the
    single-chip scan's zero-filled intensity shift — those positions are
    reseed positions whose P2 never takes effect.

    The diagonal edge-column re-seed is baked in here as P2 = 0 at the
    column the carry shift exposes: the kernels' band candidates are all
    >= 0 after per-column normalization (prev - min and the rolled
    variants + P1), so min(..., 0) = 0 exactly and val = cost + 0 — the
    re-seed — with no per-step select.  (The wrapped lane a chunked or
    rolled read brings into that column cannot undercut zero.)
    """
    maps = []
    for s in shifts:
        prev = (_shift2d(image, -1, -s) if reverse
                else _shift2d(image, 1, s))
        grad = jnp.abs(image - prev)
        p2m = jnp.maximum(jnp.float32(penalty1),
                          jnp.float32(penalty2) / grad)
        eff = -s if reverse else s
        if eff != 0:
            edge_col = 0 if eff > 0 else image.shape[1] - 1
            col = lax.broadcasted_iota(jnp.int32, p2m.shape, 1)
            p2m = jnp.where(col == edge_col, 0.0, p2m)
        maps.append(p2m)
    return jnp.stack(maps, axis=-1)


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts mapped to their positive equivalent."""
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


_BAND_SHIFT_IMPL = "roll"        # | "concat" — A/B'd on hardware


def _band_shift(x, direction: int):
    """Lane shift by one for the d-1 (+1) / d+1 (-1) band candidates.

    The shifted-in lane's value is irrelevant by contract — the +inf edge
    mask kills it — so a rotate (wrapped lane) and a slice+dup-edge
    concat are interchangeable; which lowers faster on the VPU is an
    empirical question (benchmarks/sgm_experiments_r3.py)."""
    if _BAND_SHIFT_IMPL == "roll":
        return _roll(x, direction, axis=1)
    if direction > 0:
        return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _p2_map_horizontal(image: jnp.ndarray, penalty1: float, penalty2: float,
                       reverse: bool) -> jnp.ndarray:
    """[H, W] adaptive-P2 map for the horizontal (along-W) family.

    Same formula as :func:`_p2_maps` evaluated on the transposed image
    with family shift 0 — the predecessor of (r, x) is (r, x-1) forward,
    (r, x+1) reverse.  No edge-column zeroing is needed: the natural
    horizontal sweep seeds through the zero-carry identity (prev == 0 =>
    normalized band == 0 => L = C), so the scan-start column's P2 value
    never takes effect.
    """
    prev = _shift2d(image, 0, -1 if reverse else 1)
    grad = jnp.abs(image - prev)
    return jnp.maximum(jnp.float32(penalty1), jnp.float32(penalty2) / grad)


def _hsweep_kernel_natural(*refs, penalty1: float, reverse: bool,
                           accumulate: bool, cw: int, width: int):
    """Horizontal-family sweep over the volume in NATURAL layout.

    The transposed formulation (reusing _sweep_kernel on a swapaxes'd
    volume) costs two full-volume HBM transposes plus a separate partial
    volume and final add.  This kernel scans along W directly: the grid
    walks [H, cw, D] column-chunk blocks left to right (right to left for
    the reverse traversal via a reversed index map), the running carry is
    one full-height [H, D] plane resident in VMEM, and each of the cw
    columns is processed by a static in-block slice — full [H, D] rows of
    VPU work per step, same throughput shape as the transposed kernel,
    zero transpose traffic.

    ``cw`` is tile-aligned (8), so the grid may be ragged: the last chunk
    holds ``width % cw`` real columns and Mosaic-padded garbage beyond.
    Every column step is guarded by ``col < width``; on the reverse
    traversal the ragged chunk comes FIRST, and the guard ensures the
    garbage never touches the carry — the scan enters the last real
    column with the pristine zero carry.

    Scan-start seeding uses the zero-carry identity (carry initialized to
    zeros => band == 0 => val = cost), which is exactly the explicit
    seed of the transposed kernel (out = base + cost, carry = cost).

    The P2 map arrives TRANSPOSED ([W, H] blocks of (cw, H)) purely for
    tile legality: an [H, cw] block would put cw on the lane axis, which
    Mosaic requires to be 128-divisible or full.
    """
    if accumulate:
        cost_ref, p2_ref, acc_ref, out_ref, carry_ref, mask_ref = refs
    else:
        cost_ref, p2_ref, out_ref, carry_ref, mask_ref = refs
        acc_ref = None
    c = pl.program_id(1)
    n = pl.num_programs(1)
    block_index = (n - 1 - c) if reverse else c
    col0 = block_index * cw
    height, _, max_disp = cost_ref.shape      # height = rows per h-block
    p1 = jnp.float32(penalty1)

    # Rows are independent for the horizontal family, so the grid may
    # also tile H (outer axis, W chunks fastest): each h-block starts a
    # fresh scan — re-init the carry at its first column chunk.
    @pl.when(c == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)   # scan-start identity
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (height, max_disp), 1)
        ones = jnp.full((height, max_disp), p1, jnp.float32)
        mask_ref[0] = jnp.where(lane == 0, inf, ones)
        mask_ref[1] = jnp.where(lane == max_disp - 1, inf, ones)

    out_dtype = out_ref.dtype
    cols = reversed(range(cw)) if reverse else range(cw)
    for w in cols:
        @pl.when(col0 + w < width)
        def _col(w=w):
            cst = cost_ref[:, w, :].astype(jnp.float32)      # [H, D]
            prev = carry_ref[0]
            # Same normalized band association as _sweep_kernel —
            # identical rounding column for column.
            pm = jnp.min(prev, axis=1, keepdims=True)
            pn = prev - pm
            up = _band_shift(pn, 1) + mask_ref[0]          # d-1, +P1
            dn = _band_shift(pn, -1) + mask_ref[1]         # d+1, +P1
            p2a = p2_ref[w, :][:, None]                      # [H, 1]
            band = jnp.minimum(jnp.minimum(pn, up),
                               jnp.minimum(dn, p2a))
            val = cst + band
            carry_ref[0] = val
            if accumulate:
                val = acc_ref[:, w, :].astype(jnp.float32) + val
            out_ref[:, w, :] = val.astype(out_dtype)


# Row-block alignment for the natural horizontal sweep when H is tiled:
# the transposed P2 map's (cw, hc) blocks put hc on the LANE axis, which
# Mosaic requires to be 128-divisible unless the block spans the full
# dimension.  Tests shrink this to exercise multi-h-block logic at toy
# shapes in interpret mode (which has no tiling constraint).
_HSWEEP_HC_ALIGN = 128


def _pick_hsweep_chunk(height: int, width: int, max_disp: int,
                       sublane: int = 8):
    """(row-block height, column-chunk width) for the natural horizontal
    sweep, or None when nothing fits the VMEM budget (then the transposed
    path is used).

    The column chunk is one sublane tile — 8 for f32, 16 for bf16
    (``sublane``; a bf16 [*, 8, D] block would pad to 16 sublanes and
    double the DMA) — with a ragged grid along W (the kernel guards the
    tail columns); 2 tiles when that divides W.  Rows are independent for
    the horizontal family, so geometries whose full-height blocks break
    the budget (HD-class) tile H as well: the largest lane-legal
    (128-aligned, see _HSWEEP_HC_ALIGN) divisor of H whose working set
    fits.
    """
    dp = (max_disp + 127) // 128 * 128
    itemsize = 32 // sublane            # sublane 8 -> f32, 16 -> bf16
    align = _HSWEEP_HC_ALIGN
    for cw in (2 * sublane, sublane):
        if cw == 2 * sublane and width % cw:
            continue
        candidates = [height] + [
            h for h in range((height // align) * align, align - 1, -align)
            if h and height % h == 0]
        for hc in candidates:
            plane = _row_vmem_bytes(hc, max_disp)    # [hc, D] f32 scratch
            block = hc * cw * dp * itemsize
            if 6 * block + 3 * plane <= _VMEM_BUDGET_BYTES:
                return hc, cw
    return None


def _hsweep_pass_natural(cost, p2map, partial, *, penalty1: float,
                         reverse: bool, chunk, interpret: bool = False,
                         out_vma=None):
    """One natural-layout horizontal traversal; accumulates onto
    ``partial`` in place when given (input_output_aliases).

    ``chunk`` is the (row-block height, column-chunk width) pair from
    :func:`_pick_hsweep_chunk`.  ``p2map`` is the [H, W] horizontal
    adaptive-P2 map; it is transposed here (a [W, H] plane costs ~H*W*4
    bytes, noise next to the volume) so its blocks are (cw, hc) —
    lane-size legal for any cw.
    """
    height, width, max_disp = cost.shape
    hc, cw = chunk
    n_chunks = -(-width // cw)                    # ragged tail allowed
    if reverse:
        blk = lambda h, c: (h, n_chunks - 1 - c, 0)
    else:
        blk = lambda h, c: (h, c, 0)

    accumulate = partial is not None
    kernel = functools.partial(_hsweep_kernel_natural, penalty1=penalty1,
                               reverse=reverse, accumulate=accumulate,
                               cw=cw, width=width)
    in_specs = [
        pl.BlockSpec((hc, cw, max_disp), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((cw, hc), lambda h, c: (blk(h, c)[1], h),
                     memory_space=pltpu.VMEM),
    ]
    args = [cost, p2map.T]
    io_aliases = {}
    if accumulate:
        in_specs.append(pl.BlockSpec((hc, cw, max_disp), blk,
                                     memory_space=pltpu.VMEM))
        args.append(partial)
        io_aliases = {2: 0}

    return pl.pallas_call(
        kernel,
        grid=(height // hc, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hc, cw, max_disp), blk,
                               memory_space=pltpu.VMEM),
        out_shape=(jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype)
                   if out_vma is None else
                   jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype, vma=out_vma)),
        scratch_shapes=[
            pltpu.VMEM((1, hc, max_disp), jnp.float32),       # carry
            pltpu.VMEM((2, hc, max_disp), jnp.float32),       # P1 masks
        ],
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)


def _sweep_kernel(*refs, families, penalty1: float, reverse: bool,
                  accumulate: bool, rows_per_step: int = 1,
                  mask_scratch: bool = True, w_chunks: int = 1):
    if accumulate:
        cost_ref, p2_ref, acc_ref, out_ref, carry_ref, *rest = refs
    else:
        cost_ref, p2_ref, out_ref, carry_ref, *rest = refs
        acc_ref = None
    mask_ref = rest[0] if mask_scratch else None
    i = pl.program_id(0)
    n_fam = len(families)
    p1 = jnp.float32(penalty1)
    _, width, max_disp = cost_ref.shape
    cw = width // w_chunks

    def _masks(w):
        # Additive band-edge masks with P1 folded in: +inf at the lane a
        # d-1/d+1 shift wraps into, P1 elsewhere.  One add applies both the
        # edge kill and the P1 penalty (replaces iota/compare/select AND
        # the separate "+ p1").
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (w, max_disp), 1)
        ones = jnp.full((w, max_disp), p1, jnp.float32)
        return (jnp.where(lane == 0, inf, ones),
                jnp.where(lane == max_disp - 1, inf, ones))

    if mask_scratch:
        # Cached in VMEM across grid steps; skipped for very large rows
        # where the two extra [W, D] buffers would break the VMEM budget.
        @pl.when(i == 0)
        def _init_masks():
            mask_ref[0], mask_ref[1] = _masks(width)

    # Block rows run in scan order within the block (memory-descending for
    # reverse sweeps, whose grid also walks blocks back to front); only the
    # first row of the first block seeds.
    # Blocks may be stored bfloat16 (half the HBM/VMEM traffic); the
    # recurrence always runs float32 — widen on load, narrow on store.
    out_dtype = out_ref.dtype
    row_order = (list(reversed(range(rows_per_step))) if reverse
                 else list(range(rows_per_step)))
    for step_idx, r in enumerate(row_order):
        cost = cost_ref[r].astype(jnp.float32)       # [W, D]
        base = (acc_ref[r].astype(jnp.float32) if accumulate
                else jnp.zeros_like(cost))

        if step_idx == 0:
            @pl.when(i == 0)
            def _seed(r=r, cost=cost, base=base):
                for c in range(w_chunks):
                    sl = slice(c * cw, (c + 1) * cw)
                    for idx in range(n_fam):
                        carry_ref[idx, sl] = cost[sl]
                    out_ref[r, sl] = (base[sl] + jnp.float32(n_fam)
                                      * cost[sl]).astype(out_dtype)

        def _step(r=r, cost=cost, base=base):
            # W is processed in ``w_chunks`` sub-blocks to bound the live
            # vector temporaries (the VMEM "stack") for very large W*D
            # rows.  A diagonal's shifted carry is read as the neighboring
            # [c*cw-shift, (c+1)*cw-shift) slice; chunks are walked against
            # the shift direction so a chunk reads its boundary column
            # before the neighboring chunk overwrites it.  The one wrapped
            # element in the outermost chunk lands exactly on the edge
            # column, whose value is overridden by the re-seed.
            if mask_scratch:
                full_masks = (mask_ref[0], mask_ref[1])
            chunk_totals = [None] * w_chunks
            for idx, s in enumerate(families):
                shift = -s if reverse else s
                chunk_order = (range(w_chunks) if shift <= 0
                               else reversed(range(w_chunks)))
                for c in chunk_order:
                    sl = slice(c * cw, (c + 1) * cw)
                    if shift == 0 or w_chunks == 1:
                        prev = carry_ref[idx, sl]
                        if shift != 0:
                            prev = _roll(prev, shift, axis=0)
                    elif shift > 0:
                        if c == 0:
                            prev = _roll(carry_ref[idx, 0:cw], 1, axis=0)
                        else:
                            prev = carry_ref[idx,
                                             c * cw - 1:(c + 1) * cw - 1]
                    else:
                        if c == w_chunks - 1:
                            prev = _roll(carry_ref[idx, width - cw:width],
                                         -1, axis=0)
                        else:
                            prev = carry_ref[idx,
                                             c * cw + 1:(c + 1) * cw + 1]
                    if mask_scratch:
                        mask_up = full_masks[0][sl]
                        mask_dn = full_masks[1][sl]
                    else:
                        mask_up, mask_dn = _masks(cw)
                    # Normalized band (see ops/aggregation.py step): with
                    # prev - min subtracted up front, the P2 candidate is
                    # the bare P2_adj broadcast and no trailing "-min" is
                    # needed; the masks carry P1.  Same association as the
                    # XLA scan — identical rounding.
                    prev_min = jnp.min(prev, axis=1, keepdims=True)
                    p2a = p2_ref[r, sl, idx][:, None]            # [cw, 1]
                    prevn = prev - prev_min
                    up = _band_shift(prevn, 1) + mask_up       # d-1, +P1
                    down = _band_shift(prevn, -1) + mask_dn    # d+1, +P1
                    band = jnp.minimum(jnp.minimum(prevn, up),
                                       jnp.minimum(down, p2a))
                    # Diagonal edge-column re-seed comes via p2a == 0 there
                    # (band = 0 exactly, see _p2_maps) — no select needed.
                    val = cost[sl] + band
                    carry_ref[idx, sl] = val
                    t = chunk_totals[c]
                    # Accumulation order matches the unchunked kernel:
                    # base first, then families in order.
                    chunk_totals[c] = (base[sl] + val if t is None
                                       else t + val)
            for c in range(w_chunks):
                sl = slice(c * cw, (c + 1) * cw)
                out_ref[r, sl] = chunk_totals[c].astype(out_dtype)

        if step_idx == 0:
            pl.when(i > 0)(_step)
        else:
            _step()


def _sweep_kernel_wgrid(*refs, families, penalty1: float, reverse: bool,
                        accumulate: bool):
    """Row sweep with the W axis on the grid: blocks are [1, cw, D] column
    chunks while the persistent carry stays full-width in VMEM.

    This keeps ALL row-direction families advancing in one pass at
    geometries whose full-width row blocks break the VMEM budget (the
    W-chunked-persistent-carry mode; previously such shapes fell back to
    one-family-per-pass, tripling HBM traffic).

    Chunks run left to right within each row (grid iterates the chunk axis
    fastest).  Cross-chunk carry reads:

    * effective shift < 0 (reads column c*cw+cw, owned by the chunk to the
      right): read it directly from the carry scratch — the right chunk
      has not been updated this row yet, so the value is pre-update.
    * effective shift > 0 (reads column c*cw-1, owned by the chunk to the
      left, which HAS already been updated this row): every chunk stashes
      the pre-update value of its last column in an [F, 1, D] scratch
      before overwriting its carry slice; the next chunk reads the stash
      (loaded before it stores its own, so one buffer suffices).

    The global edge column of each diagonal still re-seeds from the raw
    cost, which also covers the wrapped/garbage lane the border chunks see.
    One row per grid step: a multi-row block would need future values from
    right-neighbor chunks for shift < 0.
    """
    if accumulate:
        cost_ref, p2_ref, acc_ref, out_ref, carry_ref, mask_ref, stash_ref \
            = refs
    else:
        cost_ref, p2_ref, out_ref, carry_ref, mask_ref, stash_ref = refs
        acc_ref = None
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_fam = len(families)
    p1 = jnp.float32(penalty1)
    _, cw, max_disp = cost_ref.shape
    width = carry_ref.shape[1]
    c0 = c * cw
    col = lax.broadcasted_iota(jnp.int32, (cw, 1), 0)

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init_masks():
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (cw, max_disp), 1)
        ones = jnp.full((cw, max_disp), p1, jnp.float32)
        mask_ref[0] = jnp.where(lane == 0, inf, ones)
        mask_ref[1] = jnp.where(lane == max_disp - 1, inf, ones)
        # Finite (never NaN) stash for chunk 0's global-edge column, whose
        # P2 = 0 re-seed needs min(candidates >= 0, 0) = 0 to hold.
        stash_ref[...] = jnp.zeros_like(stash_ref)

    out_dtype = out_ref.dtype
    cost = cost_ref[0].astype(jnp.float32)            # [cw, D]
    base = (acc_ref[0].astype(jnp.float32) if accumulate
            else jnp.zeros_like(cost))

    @pl.when(i == 0)
    def _seed():
        for idx in range(n_fam):
            carry_ref[idx, pl.ds(c0, cw)] = cost
        out_ref[0] = (base + jnp.float32(n_fam) * cost).astype(out_dtype)

    @pl.when(i > 0)
    def _step():
        total = base
        for idx, s in enumerate(families):
            shift = -s if reverse else s
            block = carry_ref[idx, pl.ds(c0, cw)]
            if shift > 0:
                # Read the left chunk's stashed boundary column, THEN
                # stash this chunk's own pre-update last column for the
                # chunk to the right (program order keeps the load ahead
                # of the store, so one buffer serves the whole row).
                # Chunk 0 owns the global edge: force zeros there — the
                # P2 = 0 re-seed needs finite (non-NaN) candidates, and
                # the stale stash could be an all-inf column.
                stash_in = jnp.where(c == 0, 0.0, stash_ref[idx])
                stash_ref[idx] = block[cw - 1:cw]
                prev = jnp.where(col == 0, stash_in,
                                 _roll(block, 1, axis=0))
            elif shift < 0:
                nxt = carry_ref[idx,
                                pl.ds(jnp.minimum(c0 + cw, width - 1), 1)]
                prev = jnp.where(col == cw - 1, nxt,
                                 _roll(block, -1, axis=0))
            else:
                prev = block
            prev_min = jnp.min(prev, axis=1, keepdims=True)
            p2a = p2_ref[0, :, idx][:, None]                     # [cw, 1]
            prevn = prev - prev_min
            up = _band_shift(prevn, 1) + mask_ref[0]           # d-1, +P1
            down = _band_shift(prevn, -1) + mask_ref[1]        # d+1, +P1
            band = jnp.minimum(jnp.minimum(prevn, up),
                               jnp.minimum(down, p2a))
            val = cost + band      # edge re-seed via p2a == 0 (_p2_maps)
            carry_ref[idx, pl.ds(c0, cw)] = val
            total = total + val
        out_ref[0] = total.astype(out_dtype)


def _chunk_kernel(cost_ref, p2_ref, carry_in_ref, seed_ref, out_ref,
                  carry_out_ref, carry_ref, mask_ref, *,
                  families, penalty1: float, reverse: bool,
                  rows_per_step: int):
    """Chunk sweep with explicit carry I/O — the multi-chip building block.

    Like _sweep_kernel, but the running path costs start from
    ``carry_in`` (handed over ICI from the neighboring tile owner) and the
    final carry is emitted for the next tile.  ``seed`` (scalar) marks the
    true path start: the first streamed row re-seeds from the raw cost
    (carry_in is then ignored; pass +inf).
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    n_fam = len(families)
    p1 = jnp.float32(penalty1)
    _, width, max_disp = cost_ref.shape
    seed = seed_ref[0, 0] != 0

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = carry_in_ref[...]
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1)
        ones = jnp.full((width, max_disp), p1, jnp.float32)
        mask_ref[0] = jnp.where(lane == 0, inf, ones)
        mask_ref[1] = jnp.where(lane == max_disp - 1, inf, ones)

    out_dtype = out_ref.dtype
    row_order = (list(reversed(range(rows_per_step))) if reverse
                 else list(range(rows_per_step)))
    for step_idx, r in enumerate(row_order):
        cost = cost_ref[r].astype(jnp.float32)       # [W, D]
        is_chunk_start = step_idx == 0

        def _step(r=r, cost=cost, is_chunk_start=is_chunk_start):
            total = jnp.zeros_like(cost)
            mask_up = mask_ref[0]
            mask_dn = mask_ref[1]
            new_carries = []
            # Seed only at the true path start (first row of the whole
            # scan on the rank-0 tile); the recurrence's NaNs from an
            # all-inf carry are discarded by the select.
            start = (jnp.logical_and(seed, i == 0) if is_chunk_start
                     else None)
            for idx, s in enumerate(families):
                shift = -s if reverse else s
                prev = carry_ref[idx]                # [W, D]
                if shift != 0:
                    prev = _roll(prev, shift, axis=0)
                # Normalized band, same association as _sweep_kernel and
                # the XLA scan (masks carry P1) — identical rounding.
                prev_min = jnp.min(prev, axis=1, keepdims=True)  # [W, 1]
                p2a = p2_ref[r, :, idx][:, None]                 # [W, 1]
                prevn = prev - prev_min
                up = _band_shift(prevn, 1) + mask_up           # d-1, +P1
                down = _band_shift(prevn, -1) + mask_dn        # d+1, +P1
                band = jnp.minimum(jnp.minimum(prevn, up),
                                   jnp.minimum(down, p2a))
                val = cost + band  # edge re-seed via p2a == 0 (_p2_maps)
                if start is not None:
                    val = jnp.where(start, cost, val)
                new_carries.append(val)
                total = total + val
            for idx in range(n_fam):
                carry_ref[idx] = new_carries[idx]
            out_ref[r] = total.astype(out_dtype)

        _step()

    @pl.when(i == nb - 1)
    def _emit():
        carry_out_ref[...] = carry_ref[...]


def _chunk_kernel_wgrid(cost_ref, p2_ref, carry_in_ref, seed_ref, out_ref,
                        carry_out_ref, mask_ref, stash_ref, *,
                        families, penalty1: float, reverse: bool):
    """W-on-grid variant of _chunk_kernel: cost/out blocks are column
    chunks while both carry buffers use grid-invariant index maps, so they
    are DMA'd once (in at the first visit, out at the end) and stay
    VMEM-resident in between — ``carry_out`` doubles as the working carry
    (initialized from ``carry_in`` on each chunk's first visit).  Same
    cross-chunk boundary mechanics as _sweep_kernel_wgrid; this is what
    keeps the sharded exact mode inside VMEM at HD geometries."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_fam = len(families)
    p1 = jnp.float32(penalty1)
    _, cw, max_disp = cost_ref.shape
    width = carry_out_ref.shape[1]
    c0 = c * cw
    col = lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
    seed = seed_ref[0, 0] != 0
    out_dtype = out_ref.dtype

    @pl.when(i == 0)
    def _init():
        for idx in range(n_fam):
            carry_out_ref[idx, pl.ds(c0, cw)] = \
                carry_in_ref[idx, pl.ds(c0, cw)]

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init_masks():
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (cw, max_disp), 1)
        ones = jnp.full((cw, max_disp), p1, jnp.float32)
        mask_ref[0] = jnp.where(lane == 0, inf, ones)
        mask_ref[1] = jnp.where(lane == max_disp - 1, inf, ones)
        # Chunk 0's boundary column is the global edge: its value never
        # matters (P2 = 0 re-seeds there), but it must be FINITE — the
        # re-seed relies on min(candidates >= 0, 0) = 0, and scratch
        # garbage can be NaN.
        stash_ref[...] = jnp.zeros_like(stash_ref)

    cost = cost_ref[0].astype(jnp.float32)
    start = jnp.logical_and(seed, i == 0)
    total = jnp.zeros_like(cost)
    for idx, s in enumerate(families):
        shift = -s if reverse else s
        block = carry_out_ref[idx, pl.ds(c0, cw)]
        if shift > 0:
            # Chunk 0's global-edge read must be finite for the P2 = 0
            # re-seed: force zeros (the stash could hold an all-inf
            # boundary column, e.g. from a +inf seed carry).
            stash_in = jnp.where(c == 0, 0.0, stash_ref[idx])
            stash_ref[idx] = block[cw - 1:cw]
            prev = jnp.where(col == 0, stash_in, _roll(block, 1, axis=0))
        elif shift < 0:
            # The right neighbor's boundary column: pre-update by chunk
            # order for i > 0, but at the scan's first row that chunk has
            # not copied carry_in into the resident buffer yet — read the
            # hand-off input directly there.
            nxt_at = pl.ds(jnp.minimum(c0 + cw, width - 1), 1)
            nxt = jnp.where(i == 0, carry_in_ref[idx, nxt_at],
                            carry_out_ref[idx, nxt_at])
            prev = jnp.where(col == cw - 1, nxt, _roll(block, -1, axis=0))
        else:
            prev = block
        prev_min = jnp.min(prev, axis=1, keepdims=True)
        p2a = p2_ref[0, :, idx][:, None]
        prevn = prev - prev_min
        up = _band_shift(prevn, 1) + mask_ref[0]
        down = _band_shift(prevn, -1) + mask_ref[1]
        band = jnp.minimum(jnp.minimum(prevn, up),
                           jnp.minimum(down, p2a))
        val = cost + band          # edge re-seed via p2a == 0 (_p2_maps)
        val = jnp.where(start, cost, val)
        carry_out_ref[idx, pl.ds(c0, cw)] = val
        total = total + val
    out_ref[0] = total.astype(out_dtype)


def _sweep_chunk_with_carry_wgrid(cost, p2map, carry_in, seed, *, families,
                                  penalty1: float, reverse: bool,
                                  n_wchunks: int, interpret: bool,
                                  out_vma):
    height, width, max_disp = cost.shape
    n_fam = len(families)
    cw = width // n_wchunks
    if reverse:
        blk = lambda i, c: (height - 1 - i, c, 0)
    else:
        blk = lambda i, c: (i, c, 0)
    whole = lambda i, c: (0, 0, 0)

    def sds(shape, dtype=jnp.float32):
        if out_vma is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, vma=out_vma)

    kernel = functools.partial(_chunk_kernel_wgrid, families=families,
                               penalty1=penalty1, reverse=reverse)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(height, n_wchunks),
        in_specs=[
            pl.BlockSpec((1, cw, max_disp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw, n_fam), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fam, width, max_disp), whole,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cw, max_disp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fam, width, max_disp), whole,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(sds((height, width, max_disp), cost.dtype),
                   sds((n_fam, width, max_disp))),
        scratch_shapes=[
            pltpu.VMEM((2, cw, max_disp), jnp.float32),
            pltpu.VMEM((n_fam, 1, max_disp), jnp.float32),
        ],
        interpret=interpret,
    )(cost, p2map, carry_in.astype(jnp.float32), seed_arr)


def _chunk_fits_full_width(width: int, max_disp: int, n_fam: int) -> bool:
    """VMEM gate for the full-width chunk kernel: carry_in + carry_out +
    carry scratch (3F rows) + masks + double-buffered row blocks."""
    row_bytes = _row_vmem_bytes(width, max_disp)
    return (3 * n_fam + 2 + 6) * row_bytes <= _VMEM_BUDGET_BYTES


def sweep_chunk_with_carry(cost, p2map, carry_in, seed, *, families,
                           penalty1: float, reverse: bool,
                           interpret: bool = False, out_vma=None):
    """Chunk traversal: ([Hc,W,D], [Hc,W,F], [F,W,D], scalar) ->
    (contributions [Hc,W,D], final carry [F,W,D])."""
    height, width, max_disp = cost.shape
    n_fam = len(families)
    if not _chunk_fits_full_width(width, max_disp, n_fam):
        n_wchunks = _pick_wgrid_chunks(width, max_disp, n_fam)
        if n_wchunks is not None:
            return _sweep_chunk_with_carry_wgrid(
                cost, p2map, carry_in, seed, families=families,
                penalty1=penalty1, reverse=reverse, n_wchunks=n_wchunks,
                interpret=interpret, out_vma=out_vma)
    rows = _pick_rows_per_step(height, width, max_disp, n_fam)
    n_blocks = height // rows
    if reverse:
        row = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        row = lambda i: (i, 0, 0)

    def sds(shape, dtype=jnp.float32):
        if out_vma is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, vma=out_vma)

    kernel = functools.partial(_chunk_kernel, families=families,
                               penalty1=penalty1, reverse=reverse,
                               rows_per_step=rows)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows, width, max_disp), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width, n_fam), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fam, width, max_disp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, width, max_disp), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fam, width, max_disp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(sds((height, width, max_disp), cost.dtype),
                   sds((n_fam, width, max_disp))),
        scratch_shapes=[pltpu.VMEM((n_fam, width, max_disp), jnp.float32),
                        pltpu.VMEM((2, width, max_disp), jnp.float32)],
        interpret=interpret,
    )(cost, p2map, carry_in.astype(jnp.float32), seed_arr)


def _pick_rows_per_step(height: int, width: int, max_disp: int,
                        n_fam: int) -> int:
    """Largest divisor of H in [1, 8] whose working set fits VMEM.

    Per-pass VMEM use is roughly rows x row_bytes x 3 buffers (cost, acc,
    out) x 2 for double buffering, plus the persistent carry (n_fam rows)
    and edge masks (2 rows); cap the total near _VMEM_BUDGET_BYTES of the
    ~16 MB core.
    """
    row_bytes = _row_vmem_bytes(width, max_disp)
    budget = _VMEM_BUDGET_BYTES - (n_fam + 2) * row_bytes
    max_rows = max(int(budget // (6 * row_bytes)), 1)
    for r in (16, 12, 10, 9, 8, 6, 5, 4, 3, 2):
        if r <= max_rows and height % r == 0:
            return r
    return 1


def _fits_full_width(width: int, max_disp: int, n_fam: int,
                     storage_itemsize: int = 4) -> bool:
    """Whether full-width row blocks + carries fit the VMEM budget.

    The f32 charge — (n_fam + 2) persistent f32 rows (carry + mask/
    overhead) plus 6 double-buffered streamed rows (cost/acc/out x2) —
    is calibrated by round-4 chip evidence (hd_fullwidth_probe_r4 + the
    follow-up OOM): at HD f32 the ACCUMULATING reverse pass's scoped
    VMEM measures 19.5 MB against the 16 MB limit (the forward pass
    alone compiles — probe a pass with an acc operand before trusting a
    fit), so f32 HD correctly stays on the W-on-grid mode.  The six
    streamed rows scale with the STORAGE dtype, which is what lets bf16
    HD (1024x1280 D=256) run full-width: measured on chip, it compiles
    through the full 8-path aggregation and runs ~2-5% faster than its
    wgrid fallback (32.4 vs 33.3 ms).
    """
    row_f32 = _row_vmem_bytes(width, max_disp)
    row_store = row_f32 * storage_itemsize // 4
    return ((n_fam + 2) * row_f32 + 6 * row_store) <= _VMEM_BUDGET_BYTES


def _pick_wgrid_chunks(width: int, max_disp: int, n_fam: int):
    """Chunk count for the W-on-grid sweep: the smallest power of two whose
    working set (full-width carry + chunked blocks/masks) fits the cap,
    with 8-sublane-aligned chunks.  None if even the carry is too big."""
    row_bytes = _row_vmem_bytes(width, max_disp)
    for n in (2, 4, 8, 16, 32):
        cw = width // n
        if width % n or cw % 8:
            continue
        if n_fam * row_bytes + 10 * (row_bytes // n) <= _WGRID_BUDGET_BYTES:
            return n
    return None


def _sweep_pass_wgrid(cost, p2map, partial, *, families, penalty1: float,
                      reverse: bool, n_wchunks: int, interpret: bool,
                      out_vma):
    """W-on-grid variant of _sweep_pass (see _sweep_kernel_wgrid)."""
    height, width, max_disp = cost.shape
    n_fam = len(families)
    cw = width // n_wchunks
    if reverse:
        blk = lambda i, c: (height - 1 - i, c, 0)
    else:
        blk = lambda i, c: (i, c, 0)

    accumulate = partial is not None
    kernel = functools.partial(_sweep_kernel_wgrid, families=families,
                               penalty1=penalty1, reverse=reverse,
                               accumulate=accumulate)
    in_specs = [
        pl.BlockSpec((1, cw, max_disp), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cw, n_fam), blk, memory_space=pltpu.VMEM),
    ]
    args = [cost, p2map]
    io_aliases = {}
    if accumulate:
        in_specs.append(pl.BlockSpec((1, cw, max_disp), blk,
                                     memory_space=pltpu.VMEM))
        args.append(partial)
        io_aliases = {2: 0}

    return pl.pallas_call(
        kernel,
        grid=(height, n_wchunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cw, max_disp), blk,
                               memory_space=pltpu.VMEM),
        out_shape=(jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype)
                   if out_vma is None else
                   jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype, vma=out_vma)),
        scratch_shapes=[
            pltpu.VMEM((n_fam, width, max_disp), jnp.float32),   # carry
            pltpu.VMEM((2, cw, max_disp), jnp.float32),          # P1 masks
            pltpu.VMEM((n_fam, 1, max_disp), jnp.float32),       # boundary
        ],
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)


def _sweep_pass(cost, p2map, partial, *, families, penalty1: float,
                reverse: bool, interpret: bool = False, out_vma=None):
    """One streaming traversal over rows; accumulates onto ``partial``.

    ``out_vma``: mesh axes the output varies over — required when called
    inside a shard_map body (jax types pallas outputs explicitly there).
    """
    height, width, max_disp = cost.shape
    n_fam = len(families)
    if n_fam > 1 and not _fits_full_width(width, max_disp, n_fam,
                                          cost.dtype.itemsize):
        n_wchunks = _pick_wgrid_chunks(width, max_disp, n_fam)
        if n_wchunks is not None:
            return _sweep_pass_wgrid(cost, p2map, partial,
                                     families=families, penalty1=penalty1,
                                     reverse=reverse, n_wchunks=n_wchunks,
                                     interpret=interpret, out_vma=out_vma)
    rows = _pick_rows_per_step(height, width, max_disp, n_fam)
    n_blocks = height // rows
    if reverse:
        row = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        row = lambda i: (i, 0, 0)

    accumulate = partial is not None
    row_bytes = _row_vmem_bytes(width, max_disp)
    mask_scratch = 2 * row_bytes <= _MASK_CACHE_MAX_BYTES
    # Bound live vector temporaries: sub-chunk very large rows along W.
    w_chunks = 1
    for cand in (2, 4, 8, 16):
        if row_bytes // w_chunks <= _WCHUNK_TARGET_BYTES or width % cand:
            break
        w_chunks = cand
    kernel = functools.partial(_sweep_kernel, families=families,
                               penalty1=penalty1, reverse=reverse,
                               accumulate=accumulate, rows_per_step=rows,
                               mask_scratch=mask_scratch, w_chunks=w_chunks)
    in_specs = [
        pl.BlockSpec((rows, width, max_disp), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, width, n_fam), row, memory_space=pltpu.VMEM),
    ]
    args = [cost, p2map]
    io_aliases = {}
    if accumulate:
        in_specs.append(pl.BlockSpec((rows, width, max_disp), row,
                                     memory_space=pltpu.VMEM))
        args.append(partial)
        io_aliases = {2: 0}

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, width, max_disp), row,
                               memory_space=pltpu.VMEM),
        out_shape=(jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype)
                   if out_vma is None else
                   jax.ShapeDtypeStruct((height, width, max_disp),
                                        cost.dtype, vma=out_vma)),
        scratch_shapes=(
            [pltpu.VMEM((n_fam, width, max_disp), jnp.float32)]
            + ([pltpu.VMEM((2, width, max_disp), jnp.float32)]
               if mask_scratch else [])),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)


def _family_groups(width: int, max_disp: int,
                   storage_itemsize: int = 4):
    """Advance all 3 row-direction families per pass when possible: with
    full-width blocks when they fit VMEM, else with the W-on-grid sweep
    (chunked blocks, full-width carry).  Only when even the carry alone
    breaks the cap does it fall back to one family per pass (3x the HBM
    traffic)."""
    n_fam = len(_FAMILY_SHIFTS)
    if _fits_full_width(width, max_disp, n_fam, storage_itemsize) \
            or _pick_wgrid_chunks(width, max_disp, n_fam) is not None:
        return (_FAMILY_SHIFTS,)
    return tuple((s,) for s in _FAMILY_SHIFTS)


def _maybe_pad_rows(cost, image, n_fam):
    """Zero-pad the scan axis to a multiple of 8 when it buys materially
    larger row blocks (odd/prime heights otherwise degrade to 1-row grid
    steps).  Zero rows are the recurrence identity — the reverse sweep
    seeds on them and enters the first real row with a zero carry, whose
    normalized band is exactly 0, i.e. the seed value — so real-row
    outputs are bit-identical to the unpadded kernel.  Returns
    (cost, image, real_height)."""
    height, width, max_disp = cost.shape
    if not _fits_full_width(width, max_disp, n_fam, cost.dtype.itemsize):
        return cost, image, height          # wgrid/fallback: per-row grid
    target = -(-height // 8) * 8
    if target == height:
        return cost, image, height
    rows_now = _pick_rows_per_step(height, width, max_disp, n_fam)
    rows_padded = _pick_rows_per_step(target, width, max_disp, n_fam)
    if 2 * rows_now > rows_padded:
        # Blocks are already decent; padding would cost a volume copy
        # for little grid-step saving.
        return cost, image, height
    pad = target - height
    return (jnp.pad(cost, ((0, pad), (0, 0), (0, 0))),
            jnp.pad(image, ((0, pad), (0, 0))), height)


@functools.partial(jax.jit, static_argnames=("penalty1", "penalty2",
                                             "interpret", "horizontal"))
def semiglobal_aggregate_pallas(cost_volume: jnp.ndarray,
                                left_image: jnp.ndarray, *,
                                penalty1: float = 0.1,
                                penalty2: float = 0.2,
                                interpret: bool = False,
                                horizontal: str = "auto") -> jnp.ndarray:
    """8-direction SGM aggregation, Pallas path.

    Drop-in equivalent of ops.aggregation.semiglobal_aggregate
    (reference: AggregationOps::RunSemiglobal, src/semiglobal.cpp:167-197).

    bfloat16 volumes stream through the kernels in bfloat16 (half the HBM
    traffic of the dominant reads/writes); the recurrence itself always
    runs float32 in VMEM.  Accumulation across passes is then rounded to
    bfloat16 per pass — disparity-level accuracy cost is small and
    measured (tests/test_bf16.py, docs/performance.md).

    ``horizontal`` selects the along-W family's implementation: "natural"
    scans the volume in natural layout with a VMEM-resident [H, D] carry
    (zero transpose traffic, the measured-faster mode); "transposed"
    reuses the row-sweep kernel on a swapaxes'd volume; "auto" picks
    natural whenever a usable column chunking exists and fits VMEM.
    """
    if horizontal not in ("auto", "natural", "transposed"):
        # Validate up front: a typo ("natual") must not silently fall
        # through to the transposed path.
        raise ValueError(f"unknown horizontal mode {horizontal!r}; "
                         "expected 'auto', 'natural' or 'transposed'")
    storage = (jnp.bfloat16 if cost_volume.dtype == jnp.bfloat16
               else jnp.float32)
    cost = cost_volume.astype(storage)
    image = left_image.astype(jnp.float32)
    p1, p2 = float(penalty1), float(penalty2)

    height0, width0, max_disp = cost.shape
    sublane = 16 if storage == jnp.bfloat16 else 8
    if horizontal == "auto":
        hchunk = _pick_hsweep_chunk(height0, width0, max_disp, sublane)
        horizontal = "natural" if hchunk is not None else "transposed"
    elif horizontal == "natural":
        hchunk = _pick_hsweep_chunk(height0, width0, max_disp, sublane)
        if hchunk is None:
            raise ValueError(
                f"natural horizontal sweep unsupported at "
                f"{height0}x{width0} D={max_disp} (no usable W chunking)")

    # Row-direction families (vertical + diagonals): forward then reverse,
    # accumulated in place.  The scan axis may be zero-padded for larger
    # row blocks (identity rows — see _maybe_pad_rows).
    groups = _family_groups(*cost.shape[1:],
                            storage_itemsize=jnp.dtype(storage).itemsize)
    cost_v, image_v, height = _maybe_pad_rows(cost, image, len(groups[0]))
    partial = None
    for shifts in groups:
        p2_f = _p2_maps(image_v, p1, p2, shifts, reverse=False)
        p2_r = _p2_maps(image_v, p1, p2, shifts, reverse=True)
        partial = _sweep_pass(cost_v, p2_f, partial, families=shifts,
                              penalty1=p1, reverse=False,
                              interpret=interpret)
        partial = _sweep_pass(cost_v, p2_r, partial, families=shifts,
                              penalty1=p1, reverse=True, interpret=interpret)
    partial = partial[:height]

    if horizontal == "natural":
        # Horizontal family scanned in natural layout, accumulated in
        # place onto the row-family partial — no volume transposes, no
        # separate partial volume, no final add.
        p2h_f = _p2_map_horizontal(image, p1, p2, reverse=False)
        p2h_r = _p2_map_horizontal(image, p1, p2, reverse=True)
        out = _hsweep_pass_natural(cost, p2h_f, partial, penalty1=p1,
                                   reverse=False, chunk=hchunk,
                                   interpret=interpret)
        out = _hsweep_pass_natural(cost, p2h_r, out, penalty1=p1,
                                   reverse=True, chunk=hchunk,
                                   interpret=interpret)
        return out.astype(cost_volume.dtype)

    # Horizontal family: the same kernel over the transposed volume.
    cost_t, image_t, width = _maybe_pad_rows(jnp.swapaxes(cost, 0, 1),
                                             image.T, 1)
    p2t_f = _p2_maps(image_t, p1, p2, (0,), reverse=False)
    p2t_r = _p2_maps(image_t, p1, p2, (0,), reverse=True)
    partial_t = _sweep_pass(cost_t, p2t_f, None, families=(0,),
                            penalty1=p1, reverse=False, interpret=interpret)
    partial_t = _sweep_pass(cost_t, p2t_r, partial_t, families=(0,),
                            penalty1=p1, reverse=True, interpret=interpret)
    partial_t = partial_t[:width]

    out = partial + jnp.swapaxes(partial_t, 0, 1)
    return out.astype(cost_volume.dtype)
