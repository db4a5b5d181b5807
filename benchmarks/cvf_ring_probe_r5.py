#!/usr/bin/env python
"""Round-5 probe: ring-buffer fused wedge-CVF kernel vs the round-4 form.

Round 4 measured the 13-ref fused kernel at 2.47 ms against a 1.008 ms
core loop and named per-ref grid bookkeeping the driver
(cvf_fused_probe_r4_out.json).  The round-5 ring variant reads each
input row ONCE through 5 refs and serves the lagging taps from a VMEM
ring; this probe measures it at rows_per_step k in {1, 2, 4} (VMEM
permitting), both dtypes, against the XLA wedge path — plus the
census+CVF pipeline row the README quotes.

Run on the real chip (relay compile can take minutes per variant):
    python benchmarks/cvf_ring_probe_r5.py [--out benchmarks/cvf_ring_probe_r5_out.json]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/cvf_ring_probe_r5_out.json")
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stereomatch_tpu.ops.cvf import (_filter_body_wedge,
                                         guided_filter_aggregate)
    from stereomatch_tpu.ops.cvf_pallas import (_ring_vmem_bytes,
                                                guided_filter_wedge_pallas)
    from stereomatch_tpu.utils.benchmarking import marginal_ms

    h, w, d = 375, 450, 128            # teddy full-res
    rng = np.random.default_rng(11)
    vol = rng.random((h, w, d), np.float32).astype(np.float32)
    x, dd = np.meshgrid(np.arange(w), np.arange(d), indexing="ij")
    vol[:, x < dd] = np.inf
    guide = rng.random((h, w), np.float32)
    gj = jnp.asarray(guide)

    results = {"device": str(jax.devices()[0]),
               "geometry": f"{h}x{w} D={d} r=8"}

    def bench(fn, vol_in, label):
        body = lambda v: fn(v) * 0.5 + v * 0.5  # keep carry shape
        try:
            ms = marginal_ms(body, vol_in, chain_k=args.chain,
                             repeats=args.repeats)
            results[label] = round(ms, 3)
            print(f"{label}: {ms:.3f} ms", flush=True)
        except Exception as exc:          # noqa: BLE001 — record and go on
            results[label] = f"FAILED: {exc}"[:300]
            print(f"{label}: FAILED {exc}", flush=True)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        vj = jnp.asarray(vol, dtype)
        itemsize = jnp.dtype(dtype).itemsize
        bench(lambda v: _filter_body_wedge(v, gj, 8, 1e-4, 0)
              .astype(v.dtype), vj, f"xla_wedge_{name}")
        # Stride-k refs layout (per-row volume refs, ringed planes/pd):
        for k in (1, 2, 4):
            vm = _ring_vmem_bytes(h, w, d, 8, k, itemsize, False) / 2**20
            print(f"refs k={k} {name}: est {vm:.1f} MB VMEM", flush=True)
            bench(lambda v, k=k: guided_filter_wedge_pallas(
                v, gj, radius=8, volume_ring=False, rows_per_step=k),
                vj, f"refs_k{k}_{name}")
        # full volume-ring layout at increasing rows_per_step:
        for k in (1, 2, 4):
            vm = _ring_vmem_bytes(h, w, d, 8, k, itemsize, True) / 2**20
            print(f"ring k={k} {name}: est {vm:.1f} MB VMEM", flush=True)
            if vm > 15.5:
                results[f"ring_k{k}_{name}"] = f"skipped ({vm:.1f} MB)"
                continue
            bench(lambda v, k=k: guided_filter_wedge_pallas(
                v, gj, radius=8, rows_per_step=k, volume_ring=True),
                vj, f"ring_k{k}_{name}")

    # Pipeline row: census cost + fused CVF + WTA (the round-4 flagship).
    from stereomatch_tpu.ops.cost import census_hamming_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    li = jnp.asarray(rng.random((h, 2 * w), np.float32)[:, :w])
    ri = jnp.asarray(rng.random((h, w), np.float32))

    for vdt, vname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        def pipe(c, vdt=vdt):
            lv = li + c * 1e-9
            volc = census_hamming_cost_volume(lv, ri, max_disparity=d,
                                              cost_dtype=vdt)
            agg = guided_filter_aggregate(volc, lv, radius=8,
                                          wedge_offset=0)
            return winner_takes_all(agg).astype(jnp.float32).mean()

        ms = marginal_ms(pipe, jnp.float32(0.0),
                         chain_k=args.chain, repeats=args.repeats)
        results[f"pipeline_census_cvf_wta_{vname}"] = round(ms, 3)
        print(f"pipeline_census_cvf_wta_{vname}: {ms:.3f} ms", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
