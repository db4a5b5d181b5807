"""Round-3 cost-stage experiments: ZNCC restructure + SSD kernel forensics.

1. ZNCC: the plane-algebra formulation (one volume box pass instead of
   six) vs the round-2 stacked-statistics timing at the suite geometry.
2. SSD streaming kernel at teddy D=128: where does the time go?  The
   suspect is the per-row [D, W] -> [W, D] transpose before the store;
   measured by an ablated kernel variant that stores WITHOUT the
   transpose into an [H, D, W] dummy output (wrong layout — timing only).

Writes benchmarks/cost_experiments_r3_out.json.
"""

import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereomatch_tpu.ops import ssd_pallas as sp
from stereomatch_tpu.ops.cost import ssd_cost_volume, zncc_cost_volume
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "cost_experiments_r3_out.json"
results = {}


def record(name, ms):
    results[name] = round(ms, 4)
    print(f"{name:44s} {ms:9.3f} ms", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


rng = np.random.default_rng(0)

# --- ZNCC at the suite geometry (512x256, D=32) -----------------------------
h1, w1, d1 = 256, 512, 32
l1 = jax.device_put(rng.random((h1, w1), np.float32))
r1 = jax.device_put(rng.random((h1, w1), np.float32))


def zncc_body(carry):
    l, r = carry
    v = zncc_cost_volume(l, r, max_disparity=d1, kernel_size=7)
    return l + jnp.float32(1e-12) * v[:, :, 0], r


record("zncc_plane_512x256_d32", marginal_ms(zncc_body, (l1, r1), 8, 5))

# --- SSD streaming kernel forensics at teddy D=128 --------------------------
h2, w2, d2 = 375, 450, 128
l2 = jax.device_put(rng.random((h2, w2), np.float32))
r2 = jax.device_put(rng.random((h2, w2), np.float32))


def ssd_xla_body(carry):
    l, r = carry
    v = ssd_cost_volume(l, r, max_disparity=d2, kernel_size=7)
    return l + jnp.float32(1e-12) * v[:, :, 0], r


record("ssd_xla_teddy_d128", marginal_ms(ssd_xla_body, (l2, r2), 8, 5))


def ssd_pallas_body(carry):
    l, r = carry
    v = sp.ssd_cost_volume_pallas(l, r, max_disparity=d2, kernel_size=7)
    return l + jnp.float32(1e-12) * v[:, :, 0], r


record("ssd_pallas_teddy_d128", marginal_ms(ssd_pallas_body, (l2, r2), 8, 5))


# Ablation: identical kernel with the final transpose removed — output is
# [H, D, W] (semantically wrong layout; timing isolates the per-row
# [D, W] -> [W, D] relayout cost).
def _cost_kernel_notranspose(left_ref, right_ref, out_ref, ring_ref, *,
                             height, width, max_disp, kernel_size,
                             rows_per_step):
    t = pl.program_id(0)
    k = kernel_size
    m = 2 * k
    cdt = ring_ref.dtype
    zero = jnp.zeros((), cdt)
    d_iota = lax.broadcasted_iota(jnp.int32, (max_disp, width), 0)
    w_iota = lax.broadcasted_iota(jnp.int32, (max_disp, width), 1)
    valid_dw = w_iota >= d_iota
    bit_masks = []
    bit = 1
    while bit < max_disp:
        bit_masks.append((bit, (d_iota & bit) != 0))
        bit *= 2

    def _row_window_sums(j):
        lrow = jnp.broadcast_to(left_ref[0, pl.ds(j, 1), :],
                                (max_disp, width))
        v = jnp.broadcast_to(right_ref[0, pl.ds(j, 1), :],
                             (max_disp, width))
        for bit, take in bit_masks:
            v = jnp.where(take, pltpu.roll(v, bit, axis=1), v)
        diff = lrow - v
        term = jnp.where(valid_dw, diff * diff, zero)
        buf = jnp.pad(term, ((0, 0), (k, k)))
        wp = width + 2 * k
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
        return total[:, :width]

    @pl.when(t == 0)
    def _prologue():
        ring_ref[...] = jnp.zeros((m, max_disp, width), cdt)
        for r in range(min(k - 1, height)):
            ring_ref[pl.ds(r % m, 1)] = _row_window_sums(r)[None]

    vsum = None
    for r_local in range(rows_per_step):
        o = t * rows_per_step + r_local
        j = o + k - 1
        new = _row_window_sums(jnp.minimum(j, height - 1))
        new = jnp.where(j < height, new, zero)
        slot = lax.rem(j, m)
        old = ring_ref[pl.ds(slot, 1)][0]
        ring_ref[pl.ds(slot, 1)] = new[None]
        if r_local == 0:
            vsum = ring_ref[0]
            for s in range(1, m):
                vsum = vsum + ring_ref[s]
        else:
            vsum = vsum + new - old
        out_ref[r_local] = vsum                      # [D, W] — no .T


@functools.partial(jax.jit, static_argnames=())
def ssd_pallas_notranspose(left, right):
    height, width = left.shape
    k, d = 7, d2
    rows = sp._rows_per_step(height)
    kernel = functools.partial(_cost_kernel_notranspose, height=height,
                               width=width, max_disp=d, kernel_size=k,
                               rows_per_step=rows)
    whole = lambda t: (0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(height // rows,),
        in_specs=[
            pl.BlockSpec((1, height, width), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height, width), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d, width), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, d, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * k, d, width), jnp.float32)],
    )(left[None], right[None])


def ssd_nt_body(carry):
    l, r = carry
    v = ssd_pallas_notranspose(l, r)
    return l + jnp.float32(1e-12) * v[:, 0, :], r


record("ssd_pallas_noT_teddy_d128",
       marginal_ms(ssd_nt_body, (l2, r2), 8, 5))

print(json.dumps(results), flush=True)
