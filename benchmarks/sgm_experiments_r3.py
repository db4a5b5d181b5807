"""Round-3 TPU experiments: the natural-layout horizontal SGM sweep.

Decomposes teddy-geometry SGM into its pieces and A/Bs the two
horizontal-family implementations:

  * transposed (round 1-2): swapaxes the volume, reuse the row-sweep
    kernel, swapaxes the partial back, final add — ~9 volume-sized HBM
    transfers for the horizontal unit alone;
  * natural (round 3): scan along W directly with a VMEM-resident [H, D]
    carry — 5 transfers, zero transposes.

Writes benchmarks/sgm_experiments_r3_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops import sgm_pallas
from stereomatch_tpu.ops.cost import (census_hamming_cost_volume,
                                      ssd_cost_volume)
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "sgm_experiments_r3_out.json"
results = {}


def record(name, ms):
    results[name] = round(ms, 4)
    print(f"{name:44s} {ms:9.3f} ms", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


rng = np.random.default_rng(0)
h, w, d = 375, 450, 128
l2 = jax.device_put(rng.random((h, w), np.float32))
r2 = jax.device_put(rng.random((h, w), np.float32))
vol2 = jax.device_put(rng.random((h, w, d), np.float32))

print("hsweep chunk at teddy:", sgm_pallas._pick_hsweep_chunk(h, w, d),
      flush=True)

# --- on-chip parity first: natural vs transposed must be last-ulp and
# WTA-identical on the real Mosaic lowering, not just interpret mode ---
agg_t = sgm_pallas.semiglobal_aggregate_pallas(vol2, l2,
                                               horizontal="transposed")
agg_n = sgm_pallas.semiglobal_aggregate_pallas(vol2, l2,
                                               horizontal="natural")
at, an = np.asarray(agg_t), np.asarray(agg_n)
fin = np.isfinite(at)
rel = float(np.max(np.abs(at[fin] - an[fin])
                   / np.maximum(np.abs(at[fin]), 1e-9)))
wta_eq = bool(np.array_equal(np.asarray(winner_takes_all(agg_t)),
                             np.asarray(winner_takes_all(agg_n))))
results["hw_parity"] = {"max_rel": rel, "wta_equal": wta_eq,
                        "inf_ok": bool((np.isfinite(an) == fin).all())}
print("hw parity:", results["hw_parity"], flush=True)
OUT.write_text(json.dumps(results, indent=2))


def sgm_body(mode):
    def body(carry):
        v, img = carry
        out = sgm_pallas.semiglobal_aggregate_pallas(v, img,
                                                     horizontal=mode)
        return v + jnp.float32(1e-12) * out[:, :, :1], img
    return body


record("teddy_sgm_transposed", marginal_ms(sgm_body("transposed"),
                                           (vol2, l2), 8, 5))
record("teddy_sgm_natural", marginal_ms(sgm_body("natural"),
                                        (vol2, l2), 8, 5))


# --- decomposition: row passes only (the shared part) ---
def rows_only_body(carry):
    v, img = carry
    p1, p2 = 0.1, 0.2
    groups = sgm_pallas._family_groups(*v.shape[1:])
    cost_v, image_v, height = sgm_pallas._maybe_pad_rows(
        v, img, len(groups[0]))
    partial = None
    for shifts in groups:
        p2f = sgm_pallas._p2_maps(image_v, p1, p2, shifts, reverse=False)
        p2r = sgm_pallas._p2_maps(image_v, p1, p2, shifts, reverse=True)
        partial = sgm_pallas._sweep_pass(cost_v, p2f, partial,
                                         families=shifts, penalty1=p1,
                                         reverse=False)
        partial = sgm_pallas._sweep_pass(cost_v, p2r, partial,
                                         families=shifts, penalty1=p1,
                                         reverse=True)
    out = partial[:height]
    return v + jnp.float32(1e-12) * out[:, :, :1], img


record("teddy_sgm_rows_only", marginal_ms(jax.jit(rows_only_body),
                                          (vol2, l2), 8, 5))


# --- full pipelines with each mode ---
def pipe_body(mode, cost_fn):
    def body(carry):
        l, r = carry
        vol = cost_fn(l, r)
        agg = sgm_pallas.semiglobal_aggregate_pallas(vol, l,
                                                     horizontal=mode)
        disp = winner_takes_all(agg)
        return l + jnp.float32(1e-12) * disp.astype(jnp.float32), r
    return body


ssd = lambda l, r: ssd_cost_volume(l, r, max_disparity=d, kernel_size=7)
census_bf16 = lambda l, r: census_hamming_cost_volume(
    l, r, max_disparity=d, cost_dtype=jnp.bfloat16)

record("teddy_pipeline_transposed",
       marginal_ms(pipe_body("transposed", ssd), (l2, r2), 8, 5))
record("teddy_pipeline_natural",
       marginal_ms(pipe_body("natural", ssd), (l2, r2), 8, 5))
record("teddy_census_bf16_pipeline_natural",
       marginal_ms(pipe_body("natural", census_bf16), (l2, r2), 8, 5))

# --- band-shift A/B: pltpu.roll vs slice+concat for the d+-1 shifts ---
# (the VPU probe suggested concat may lower cheaper; decide on the real
# kernel.  __wrapped__ avoids the jit cache, which cannot see the flag.)
def sgm_body_unjit(carry):
    v, img = carry
    out = sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(
        v, img, horizontal="natural")
    return v + jnp.float32(1e-12) * out[:, :, :1], img


for impl in ("roll", "concat"):
    sgm_pallas._BAND_SHIFT_IMPL = impl
    record(f"teddy_sgm_natural_shift_{impl}",
           marginal_ms(sgm_body_unjit, (vol2, l2), 8, 5))
sgm_pallas._BAND_SHIFT_IMPL = "roll"

# --- HD geometry: does natural apply there? ---
h3, w3, d3 = 1024, 1280, 256
print("hsweep chunk at HD:", sgm_pallas._pick_hsweep_chunk(h3, w3, d3),
      flush=True)
l3 = jax.device_put(rng.random((h3, w3), np.float32))
vol3 = jax.device_put(rng.random((h3, w3, d3), np.float32))
cw_hd = sgm_pallas._pick_hsweep_chunk(h3, w3, d3)
if cw_hd is not None:
    record("hd_sgm_natural", marginal_ms(sgm_body("natural"),
                                         (vol3, l3), 2, 3))
record("hd_sgm_transposed", marginal_ms(sgm_body("transposed"),
                                        (vol3, l3), 2, 3))

print(json.dumps(results), flush=True)
