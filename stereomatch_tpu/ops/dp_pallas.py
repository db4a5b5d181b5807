"""Pallas TPU kernels for the dynamic-programming scanline reducer.

Reference: DisparityReduceOps::RunDynamicProgramming
(src/dynamic_programming.cu:184-225) — per-row forward band-min
accumulation with int8 back-pointers, per-row argmin of the final column,
then a right-to-left pointer walk.  The XLA scan formulation
(ops/disparity.py) pays per-step fusion overhead twice over W; here both
passes are streaming Pallas kernels over a W-major volume:

* Forward kernel: grid over W, one [1, H, D] block per step, the running
  accumulator [H, D] in VMEM scratch.  Emits the back-pointer volume in
  the reference's {-1, 0, +1} int8 encoding (selected in f32 and packed
  on store — Mosaic cannot relayout f32-tiled comparison masks onto int8
  tiles directly) and the final-column costs.
* Backward kernel: grid over W in reverse.  The per-row current disparity
  is carried as a ONE-HOT [H, D] mask in VMEM rather than an index vector:
  reading the pointer under the index becomes a lane-masked sum, and
  "current += direction (clipped)" becomes a select of lane-shifted masks
  — all dense VPU work, no gathers (TPUs have no per-sublane gather).

The W-major layout means one XLA transpose of the cost volume on the way
in; back-pointers never leave W-major order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int):
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _forward_kernel(cost_ref, ptr_ref, final_ref, acc_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    cost = cost_ref[0]                                # [H, D] f32
    height, max_disp = cost.shape
    inf = jnp.float32(jnp.inf)
    lane = lax.broadcasted_iota(jnp.int32, (height, max_disp), 1)

    @pl.when(i == 0)
    def _():
        # Column 0: accumulator = raw cost, pointers defined as 0
        # (the reference's col-0 writes go through transposed indices and
        # are effectively uninitialized, dynamic_programming.cu:31,100 —
        # 0 is the intended no-predecessor value).
        acc_ref[...] = cost
        ptr_ref[0] = jnp.zeros((height, max_disp), jnp.int8)

    @pl.when(i > 0)
    def _():
        prev = acc_ref[...]
        c1 = jnp.where(lane == 0, inf, _roll(prev, 1, axis=1))    # acc[d-1]
        c2 = prev
        c3 = jnp.where(lane == max_disp - 1, inf,
                       _roll(prev, -1, axis=1))                   # acc[d+1]
        #

        take1 = jnp.logical_and(c1 < c2, c1 < c3)
        take2 = c2 < c3
        # Compute the {-1,0,+1} pointer in f32 and narrow on store: Mosaic
        # cannot relayout f32-tiled comparison masks onto int8 tiles, but
        # an f32 -> int8 convert is a plain pack.
        direction = jnp.where(
            take1, jnp.float32(-1),
            jnp.where(take2, jnp.float32(0), jnp.float32(1)))
        min_cost = jnp.where(take1, c1, jnp.where(take2, c2, c3))
        acc_ref[...] = cost + min_cost
        ptr_ref[0] = direction.astype(jnp.int8)

    @pl.when(i == n - 1)
    def _():
        final_ref[...] = acc_ref[...]


def _backward_kernel(ptr_ref, final_ref, disp_ref, cur_ref):
    """Grid step i handles column W-1-i.

    cur_ref holds the one-hot of the disparity already emitted for column
    W-i (the column to the right); the trace semantics are
    d[w] = clip(d[w+1] + ptr[w][d[w+1]]).
    """
    i = pl.program_id(0)
    height, max_disp = cur_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (height, max_disp), 1)

    @pl.when(i == 0)
    def _():
        # Column W-1: argmin of the final forward costs, ties -> lowest d
        # (torch::argmin semantics, dynamic_programming.cu:207).
        final = final_ref[...]
        fmin = jnp.min(final, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(final == fmin, lane, max_disp),
                      axis=1, keepdims=True)       # first (lowest-d) min
        onehot = (lane == idx).astype(jnp.float32)
        cur_ref[...] = onehot
        disp_ref[0] = jnp.sum(onehot * lane.astype(jnp.float32), axis=1,
                              keepdims=True).astype(jnp.int32)

    @pl.when(i > 0)
    def _():
        cur = cur_ref[...]                            # one-hot [H, D]
        ptr = ptr_ref[0].astype(jnp.float32)          # [H, D]
        direction = jnp.sum(ptr * cur, axis=1, keepdims=True)  # [H, 1]

        # Shift the one-hot by -1/0/+1 lanes with clipping at the band edge:
        # a bit that would fall off lane 0 (resp. D-1) stays put.
        left = jnp.where(lane == max_disp - 1, 0.0, _roll(cur, -1, axis=1))
        left = left + jnp.where(lane == 0, cur, 0.0)
        right = jnp.where(lane == 0, 0.0, _roll(cur, 1, axis=1))
        right = right + jnp.where(lane == max_disp - 1, cur, 0.0)

        new = jnp.where(direction < 0, left,
                        jnp.where(direction > 0, right, cur))
        cur_ref[...] = new
        disp_ref[0] = jnp.sum(new * lane.astype(jnp.float32), axis=1,
                              keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "out_vma"))
def dynamic_programming_pallas(cost_volume: jnp.ndarray,
                               interpret: bool = False,
                               out_vma=None) -> jnp.ndarray:
    """Scanline DP disparity, Pallas path. [H, W, D] -> [H, W] int32.

    ``out_vma``: mesh axes the outputs vary over — required inside a
    shard_map body.
    """
    def sds(shape, dtype):
        if out_vma is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, vma=out_vma)

    height, width, max_disp = cost_volume.shape
    cost_t = jnp.swapaxes(cost_volume.astype(jnp.float32), 0, 1)  # [W, H, D]

    ptrs, final = pl.pallas_call(
        _forward_kernel,
        grid=(width,),
        in_specs=[pl.BlockSpec((1, height, max_disp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, height, max_disp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((height, max_disp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            sds((width, height, max_disp), jnp.int8),
            sds((height, max_disp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((height, max_disp), jnp.float32)],
        interpret=interpret,
    )(cost_t)

    disp_t = pl.pallas_call(
        _backward_kernel,
        grid=(width,),
        in_specs=[
            pl.BlockSpec((1, height, max_disp),
                         lambda i: (width - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((height, max_disp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, height, 1),
                               lambda i: (width - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=sds((width, height, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((height, max_disp), jnp.float32)],
        interpret=interpret,
    )(ptrs, final)

    return disp_t[:, :, 0].T
