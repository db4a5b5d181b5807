"""One-off TPU experiment runner for SGM optimization work (round 2).

Measures, in a single process (one relay warm-up):
  1. teddy SGM pallas (new normalized-band kernels)
  2. teddy full pipeline SSD+SGM+WTA
  3. HD SGM: wgrid 3-family mode vs forced per-family fallback
  4. HD full pipeline

Writes one JSON blob to benchmarks/sgm_experiments_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops import sgm_pallas
from stereomatch_tpu.ops.cost import ssd_cost_volume
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "sgm_experiments_out.json"
results = {}


def record(name, ms):
    results[name] = round(ms, 4)
    print(f"{name:42s} {ms:9.3f} ms", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def feedback(img, out):
    flat = out.astype(jnp.float32)
    while flat.ndim > 2:
        flat = flat[..., 0]
    return img + jnp.float32(1e-12) * flat


rng = np.random.default_rng(0)

# ---- teddy geometry --------------------------------------------------------
h, w, d = 375, 450, 128
l2 = jax.device_put(rng.random((h, w), np.float32))
vol2 = jax.device_put(rng.random((h, w, d), np.float32))

def sgm_body(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas(v, img)
    return v + jnp.float32(1e-12) * out[:, :, :1], img

record("teddy_sgm_pallas", marginal_ms(sgm_body, (vol2, l2), 8, 5))

r2 = jax.device_put(rng.random((h, w), np.float32))

def pipe_body(carry):
    l, r = carry
    vol = ssd_cost_volume(l, r, max_disparity=d, kernel_size=7)
    agg = sgm_pallas.semiglobal_aggregate_pallas(vol, l)
    disp = winner_takes_all(agg)
    return feedback(l, disp), r

record("teddy_pipeline", marginal_ms(pipe_body, (l2, r2), 8, 5))

# ---- HD geometry -----------------------------------------------------------
h3, w3, d3 = 1024, 1280, 256
l3 = jax.device_put(rng.random((h3, w3), np.float32))
vol3 = jax.device_put(rng.random((h3, w3, d3), np.float32))

print("wgrid chunks at HD:",
      sgm_pallas._pick_wgrid_chunks(w3, d3, 3),
      "family groups:", len(sgm_pallas._family_groups(w3, d3)), flush=True)

def hd_sgm_body(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas(v, img)
    return v + jnp.float32(1e-12) * out[:, :, :1], img

record("hd_sgm_wgrid", marginal_ms(hd_sgm_body, (vol3, l3), 2, 3))

# Forced per-family fallback for comparison (round-1 behavior).
sgm_pallas._WGRID_BUDGET_BYTES = 0
assert len(sgm_pallas._family_groups(w3, d3)) == 3

def hd_sgm_perfam_body(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(v, img)
    return v + jnp.float32(1e-12) * out[:, :, :1], img

record("hd_sgm_perfamily", marginal_ms(hd_sgm_perfam_body, (vol3, l3), 2, 3))
sgm_pallas._WGRID_BUDGET_BYTES = 8 * 1024 * 1024

r3 = jax.device_put(rng.random((h3, w3), np.float32))

def hd_pipe_body(carry):
    l, r = carry
    vol = ssd_cost_volume(l, r, max_disparity=d3, kernel_size=7)
    agg = sgm_pallas.semiglobal_aggregate_pallas(vol, l)
    disp = winner_takes_all(agg)
    return feedback(l, disp), r

record("hd_pipeline", marginal_ms(hd_pipe_body, (l3, r3), 2, 3))

# bf16 VPU micro removed: pltpu.roll rejects non-32-bit data (the kernel
# crashed there on-chip; bf16 is storage-only — see docs/performance.md).

print(json.dumps(results), flush=True)
