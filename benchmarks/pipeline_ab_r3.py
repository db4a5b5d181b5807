"""Same-process A/B of the full f32 teddy pipeline: MXU box pass vs
reduce_window for the SSD H-axis, natural vs transposed SGM horizontal.

The standalone SSD probe showed the MXU pass winning 1.30 -> 1.07 ms,
but standalone ops and in-pipeline ops fuse differently (reduce_window
can consume the diff^2 producer; a dot operand is materialized) — this
decides what the PIPELINE wants.  Writes pipeline_ab_r3_out.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops import cost as cost_mod
from stereomatch_tpu.ops import sgm_pallas
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.utils.benchmarking import marginal_ms

OUT = pathlib.Path(__file__).parent / "pipeline_ab_r3_out.json"
results = {}


def record(name, ms):
    results[name] = round(ms, 4)
    print(f"{name:44s} {ms:9.3f} ms", flush=True)
    OUT.write_text(json.dumps(results, indent=2))


rng = np.random.default_rng(0)
h, w, d = 375, 450, 128
l2 = jax.device_put(rng.random((h, w), np.float32))
r2 = jax.device_put(rng.random((h, w), np.float32))


def pipe_body(carry):
    l, r = carry
    vol = cost_mod.ssd_cost_volume.__wrapped__(
        l, r, max_disparity=d, kernel_size=7)
    agg = sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(
        vol, l, horizontal="natural")
    disp = winner_takes_all(agg)
    return l + jnp.float32(1e-12) * disp.astype(jnp.float32), r


def ssd_body(carry):
    l, r = carry
    vol = cost_mod.ssd_cost_volume.__wrapped__(
        l, r, max_disparity=d, kernel_size=7)
    return l + jnp.float32(1e-12) * vol[:, :, 0], r


for gate, tag in ((512, "mxu"), (0, "rw")):
    cost_mod._BOX_MXU_MAX_N = gate
    record(f"ssd_teddy_{tag}", marginal_ms(ssd_body, (l2, r2), 8, 5))
    record(f"pipeline_teddy_{tag}", marginal_ms(pipe_body, (l2, r2), 8, 5))
cost_mod._BOX_MXU_MAX_N = 512

print(json.dumps(results), flush=True)
