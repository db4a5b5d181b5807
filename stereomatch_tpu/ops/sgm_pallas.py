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
* The horizontal family (scan along W) reuses the same kernel on a
  transposed volume — two XLA transposes are cheaper than a
  strided-DMA column walk.
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


def _shift2d(image: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Zero-filled 2-D shift: out[r, x] = image[r - rows, x - cols]."""
    out = image
    if rows:
        out = jnp.roll(out, rows, axis=0)
        edge = lax.broadcasted_iota(jnp.int32, out.shape, 0)
        bound = rows - 1 if rows > 0 else out.shape[0] + rows
        mask = (edge <= bound) if rows > 0 else (edge >= bound)
        out = jnp.where(mask, 0.0, out)
    if cols:
        out = jnp.roll(out, cols, axis=1)
        edge = lax.broadcasted_iota(jnp.int32, out.shape, 1)
        bound = cols - 1 if cols > 0 else out.shape[1] + cols
        mask = (edge <= bound) if cols > 0 else (edge >= bound)
        out = jnp.where(mask, 0.0, out)
    return out


def _p2_maps(image: jnp.ndarray, penalty1: float, penalty2: float,
             shifts, reverse: bool) -> jnp.ndarray:
    """[H, W, F] adaptive-P2 maps for one traversal direction.

    Forward predecessor of (r, x) for family shift s is (r-1, x-s); reverse
    is (r+1, x+s).  Out-of-image predecessors read as 0, mirroring the
    single-chip scan's zero-filled intensity shift — those positions are
    reseed positions whose P2 never takes effect.
    """
    maps = []
    for s in shifts:
        prev = (_shift2d(image, -1, -s) if reverse
                else _shift2d(image, 1, s))
        grad = jnp.abs(image - prev)
        maps.append(jnp.maximum(jnp.float32(penalty1),
                                jnp.float32(penalty2) / grad))
    return jnp.stack(maps, axis=-1)


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts mapped to their positive equivalent."""
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


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
        # Additive band-edge masks: +inf at the lane a d-1/d+1 shift wraps
        # into, 0 elsewhere.  x + mask replaces iota/compare/select.
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (w, max_disp), 1)
        zero = jnp.zeros((w, max_disp), jnp.float32)
        return (jnp.where(lane == 0, inf, zero),
                jnp.where(lane == max_disp - 1, inf, zero))

    if mask_scratch:
        # Cached in VMEM across grid steps; skipped for very large rows
        # where the two extra [W, D] buffers would break the VMEM budget.
        @pl.when(i == 0)
        def _init_masks():
            mask_ref[0], mask_ref[1] = _masks(width)

    # Block rows run in scan order within the block (memory-descending for
    # reverse sweeps, whose grid also walks blocks back to front); only the
    # first row of the first block seeds.
    row_order = (list(reversed(range(rows_per_step))) if reverse
                 else list(range(rows_per_step)))
    for step_idx, r in enumerate(row_order):
        cost = cost_ref[r]                           # [W, D]
        base = acc_ref[r] if accumulate else jnp.zeros_like(cost)

        if step_idx == 0:
            @pl.when(i == 0)
            def _seed(r=r, cost=cost, base=base):
                for c in range(w_chunks):
                    sl = slice(c * cw, (c + 1) * cw)
                    for idx in range(n_fam):
                        carry_ref[idx, sl] = cost[sl]
                    out_ref[r, sl] = (base[sl]
                                      + jnp.float32(n_fam) * cost[sl])

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
            col = lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
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
                    prev_min = jnp.min(prev, axis=1, keepdims=True)
                    p2a = p2_ref[r, sl, idx][:, None]            # [cw, 1]
                    up = _roll(prev, 1, axis=1) + mask_up        # d-1
                    down = _roll(prev, -1, axis=1) + mask_dn     # d+1
                    # min(up+p1, down+p1) == min(up, down)+p1 exactly.
                    band = jnp.minimum(
                        jnp.minimum(prev, jnp.minimum(up, down) + p1),
                        prev_min + p2a)
                    val = cost[sl] + band - prev_min
                    if shift != 0:
                        edge_col = 0 if shift > 0 else width - 1
                        if edge_col // cw == c:
                            val = jnp.where(col == edge_col - c * cw,
                                            cost[sl], val)
                    carry_ref[idx, sl] = val
                    t = chunk_totals[c]
                    # Accumulation order matches the unchunked kernel:
                    # base first, then families in order.
                    chunk_totals[c] = (base[sl] + val if t is None
                                       else t + val)
            for c in range(w_chunks):
                sl = slice(c * cw, (c + 1) * cw)
                out_ref[r, sl] = chunk_totals[c]

        if step_idx == 0:
            pl.when(i > 0)(_step)
        else:
            _step()


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
    col = lax.broadcasted_iota(jnp.int32, (width, 1), 0)
    seed = seed_ref[0, 0] != 0

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = carry_in_ref[...]
        inf = jnp.float32(jnp.inf)
        lane = lax.broadcasted_iota(jnp.int32, (width, max_disp), 1)
        zero = jnp.zeros((width, max_disp), jnp.float32)
        mask_ref[0] = jnp.where(lane == 0, inf, zero)
        mask_ref[1] = jnp.where(lane == max_disp - 1, inf, zero)

    row_order = (list(reversed(range(rows_per_step))) if reverse
                 else list(range(rows_per_step)))
    for step_idx, r in enumerate(row_order):
        cost = cost_ref[r]                           # [W, D]
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
                prev_min = jnp.min(prev, axis=1, keepdims=True)  # [W, 1]
                p2a = p2_ref[r, :, idx][:, None]                 # [W, 1]
                up = _roll(prev, 1, axis=1) + mask_up            # d-1
                down = _roll(prev, -1, axis=1) + mask_dn         # d+1
                band = jnp.minimum(
                    jnp.minimum(prev, jnp.minimum(up, down) + p1),
                    prev_min + p2a)
                val = cost + band - prev_min
                if shift != 0:
                    edge_col = 0 if shift > 0 else width - 1
                    val = jnp.where(col == edge_col, cost, val)
                if start is not None:
                    val = jnp.where(start, cost, val)
                new_carries.append(val)
                total = total + val
            for idx in range(n_fam):
                carry_ref[idx] = new_carries[idx]
            out_ref[r] = total

        _step()

    @pl.when(i == nb - 1)
    def _emit():
        carry_out_ref[...] = carry_ref[...]


def sweep_chunk_with_carry(cost, p2map, carry_in, seed, *, families,
                           penalty1: float, reverse: bool,
                           interpret: bool = False, out_vma=None):
    """Chunk traversal: ([Hc,W,D], [Hc,W,F], [F,W,D], scalar) ->
    (contributions [Hc,W,D], final carry [F,W,D])."""
    height, width, max_disp = cost.shape
    n_fam = len(families)
    rows = _pick_rows_per_step(height, width, max_disp, n_fam)
    n_blocks = height // rows
    if reverse:
        row = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        row = lambda i: (i, 0, 0)

    def sds(shape):
        if out_vma is None:
            return jax.ShapeDtypeStruct(shape, jnp.float32)
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=out_vma)

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
        out_shape=(sds((height, width, max_disp)),
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
    row_bytes = width * max_disp * 4
    budget = _VMEM_BUDGET_BYTES - (n_fam + 2) * row_bytes
    max_rows = max(int(budget // (6 * row_bytes)), 1)
    for r in (16, 12, 10, 9, 8, 6, 5, 4, 3, 2):
        if r <= max_rows and height % r == 0:
            return r
    return 1


def _sweep_pass(cost, p2map, partial, *, families, penalty1: float,
                reverse: bool, interpret: bool = False, out_vma=None):
    """One streaming traversal over rows; accumulates onto ``partial``.

    ``out_vma``: mesh axes the output varies over — required when called
    inside a shard_map body (jax types pallas outputs explicitly there).
    """
    height, width, max_disp = cost.shape
    n_fam = len(families)
    rows = _pick_rows_per_step(height, width, max_disp, n_fam)
    n_blocks = height // rows
    if reverse:
        row = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        row = lambda i: (i, 0, 0)

    accumulate = partial is not None
    row_bytes = width * max_disp * 4
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
                                        jnp.float32)
                   if out_vma is None else
                   jax.ShapeDtypeStruct((height, width, max_disp),
                                        jnp.float32, vma=out_vma)),
        scratch_shapes=(
            [pltpu.VMEM((n_fam, width, max_disp), jnp.float32)]
            + ([pltpu.VMEM((2, width, max_disp), jnp.float32)]
               if mask_scratch else [])),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)


def _family_groups(width: int, max_disp: int):
    """Advance all 3 row-direction families per pass when their carries and
    block buffers fit VMEM together; otherwise one family per pass (large
    W*D geometries — 3x the HBM traffic, but no VMEM ceiling)."""
    row_bytes = width * max_disp * 4
    if (len(_FAMILY_SHIFTS) + 2) * row_bytes + 6 * row_bytes \
            <= _VMEM_BUDGET_BYTES:
        return (_FAMILY_SHIFTS,)
    return tuple((s,) for s in _FAMILY_SHIFTS)


@functools.partial(jax.jit, static_argnames=("penalty1", "penalty2",
                                             "interpret"))
def semiglobal_aggregate_pallas(cost_volume: jnp.ndarray,
                                left_image: jnp.ndarray, *,
                                penalty1: float = 0.1,
                                penalty2: float = 0.2,
                                interpret: bool = False) -> jnp.ndarray:
    """8-direction SGM aggregation, Pallas path.

    Drop-in equivalent of ops.aggregation.semiglobal_aggregate
    (reference: AggregationOps::RunSemiglobal, src/semiglobal.cpp:167-197).
    """
    cost = cost_volume.astype(jnp.float32)
    image = left_image.astype(jnp.float32)
    p1, p2 = float(penalty1), float(penalty2)

    # Row-direction families (vertical + diagonals): forward then reverse,
    # accumulated in place.
    partial = None
    for shifts in _family_groups(*cost.shape[1:]):
        p2_f = _p2_maps(image, p1, p2, shifts, reverse=False)
        p2_r = _p2_maps(image, p1, p2, shifts, reverse=True)
        partial = _sweep_pass(cost, p2_f, partial, families=shifts,
                              penalty1=p1, reverse=False,
                              interpret=interpret)
        partial = _sweep_pass(cost, p2_r, partial, families=shifts,
                              penalty1=p1, reverse=True, interpret=interpret)

    # Horizontal family: the same kernel over the transposed volume.
    cost_t = jnp.swapaxes(cost, 0, 1)
    image_t = image.T
    p2t_f = _p2_maps(image_t, p1, p2, (0,), reverse=False)
    p2t_r = _p2_maps(image_t, p1, p2, (0,), reverse=True)
    partial_t = _sweep_pass(cost_t, p2t_f, None, families=(0,),
                            penalty1=p1, reverse=False, interpret=interpret)
    partial_t = _sweep_pass(cost_t, p2t_r, partial_t, families=(0,),
                            penalty1=p1, reverse=True, interpret=interpret)

    out = partial + jnp.swapaxes(partial_t, 0, 1)
    return out.astype(cost_volume.dtype)
