"""Round-2 HD validation on the chip: W-on-grid kernels at real HD shapes.

Covers what the toy-shape hardware tier cannot: the HD-geometry
compile + execution of (1) the 3-family W-on-grid sweep, (2) the
W-on-grid exact-hand-off chunk kernel (the sharded-exact HD mode, with
its grid-invariant resident carry I/O), and (3) the teddy SGM bf16
stage.  Writes benchmarks/hd_experiments_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops import sgm_pallas
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "hd_experiments_out.json"
results = {}


def record(name, value):
    results[name] = value
    print(f"{name}: {value}", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


rng = np.random.default_rng(0)

# --- teddy SGM bf16 stage --------------------------------------------------
h2, w2, d2 = 375, 450, 128
vol16 = jax.device_put(rng.random((h2, w2, d2), np.float32).astype(
    jnp.bfloat16))
l2 = jax.device_put(rng.random((h2, w2), np.float32))


def sgm16_body(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas(v, img)
    return v + (jnp.float32(1e-12) * out[:, :, :1]).astype(v.dtype), img


record("teddy_sgm_bf16_ms", round(marginal_ms(sgm16_body, (vol16, l2),
                                              8, 5), 4))

# --- HD W-on-grid sweep (post P2-map-edge-trick numbers) -------------------
h3, w3, d3 = 1024, 1280, 256
vol3 = jax.device_put(rng.random((h3, w3, d3), np.float32))
l3 = jax.device_put(rng.random((h3, w3), np.float32))


def hd_sgm_body(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas(v, img)
    return v + jnp.float32(1e-12) * out[:, :, :1], img


record("hd_sgm_wgrid_ms", round(marginal_ms(hd_sgm_body, (vol3, l3), 2, 3),
                                4))

# --- HD exact-hand-off chunk kernel (the sharded-exact HD mode) ------------
assert not sgm_pallas._chunk_fits_full_width(w3, d3, 3)
n_w = sgm_pallas._pick_wgrid_chunks(w3, d3, 3)
record("hd_chunk_wgrid_chunks", n_w)

fams = sgm_pallas._FAMILY_SHIFTS
pm = sgm_pallas._p2_maps(l3, 0.1, 0.2, fams, reverse=False)
carry = jnp.full((3, w3, d3), jnp.inf, jnp.float32)


@jax.jit
def chunk_once(v, p, c):
    out, fin = sgm_pallas.sweep_chunk_with_carry(
        v, p, c, True, families=fams, penalty1=0.1, reverse=False)
    return out[0, 0, 0] + fin[0, 0, 0]


val = float(chunk_once(vol3, pm, carry))
record("hd_chunk_wgrid_compiles_and_runs", bool(np.isfinite(val)))


def chunk_body(carry_state):
    v, p, c = carry_state
    out, fin = sgm_pallas.sweep_chunk_with_carry(
        v, p, c, True, families=fams, penalty1=0.1, reverse=False)
    return v + jnp.float32(1e-12) * out[:, :, :1], p, fin

record("hd_chunk_wgrid_ms", round(marginal_ms(chunk_body, (vol3, pm, carry),
                                              2, 3), 4))

print(json.dumps(results), flush=True)
