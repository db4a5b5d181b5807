"""Stage-level benchmark suite mirroring the reference's pytest-benchmark
groups (cost / aggregation / disparity_reduce, README.md:48-75).

Geometries follow the reference fixtures: cost benchmarks on a 512x256
pair at D=32 (tests/conftest.py:23,86), aggregation/reduce on the
full-resolution teddy shape 450x375 at D=128 (tests/conftest.py:58-78).

Timing methodology: marginal cost of one op inside a data-dependent
fori_loop chain compiled as one program — (t(chain_K) - t(chain_1))/(K-1) —
which cancels dispatch and host-transfer constants that some PJRT
transports add per call (see bench.py).

Usage:
    python benchmarks/suite.py [--json OUT.json] [--chain K] [--repeats R]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Reference GPU numbers (BASELINE.md); None where the reference has no
# directly comparable benchmark.
REFERENCE_MS = {
    "ssd_cost_512x256_d32": 2.49,
    "ssd_texture_512x256_d32": 7.29,
    "birchfield_cost_512x256_d32": 2.99,
    "sgm_450x375_d128": 6.99,
    "wta_450x375_d128": None,
    "argmin_baseline_450x375_d128": None,
    "dynprog_450x375_d128": 0.708,
    "pipeline_teddy_450x375_d128": 10.0,
    "pipeline_batch4_teddy_d128": 40.0,   # 4x the single-frame estimate
}


def _marginal_ms(body_fn, args, chain_k, repeats):
    from stereomatch_tpu.utils.benchmarking import marginal_ms
    return marginal_ms(body_fn, args, chain_k=chain_k, repeats=repeats)


def build_benchmarks():
    import jax
    import jax.numpy as jnp

    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import (birchfield_cost_volume,
                                          ssd_cost_volume)
    from stereomatch_tpu.ops.disparity import (dynamic_programming,
                                               winner_takes_all)
    from stereomatch_tpu.ops.dp_pallas import dynamic_programming_pallas
    from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas
    from stereomatch_tpu.texture import TextureImage

    on_cpu = jax.default_backend() == "cpu"
    aggregate = semiglobal_aggregate if on_cpu else semiglobal_aggregate_pallas

    rng = np.random.default_rng(0)

    # Cost group geometry: 512x256, D=32.
    h1, w1, d1 = 256, 512, 32
    l1 = jax.device_put(rng.random((h1, w1), np.float32))
    r1 = jax.device_put(rng.random((h1, w1), np.float32))

    # Aggregation / reduce group geometry: teddy full-res, D=128.
    h2, w2, d2 = 375, 450, 128
    l2 = jax.device_put(rng.random((h2, w2), np.float32))
    r2 = jax.device_put(rng.random((h2, w2), np.float32))
    vol2 = jax.device_put(rng.random((h2, w2, d2), np.float32))

    def feedback(img, out):
        """Tiny data dependency so chained iterations serialize."""
        flat = out.astype(jnp.float32)
        while flat.ndim > 2:
            flat = flat[..., 0]
        return img + jnp.float32(1e-12) * flat

    benches = {}

    def cost_bench(fn):
        def body(carry):
            l, r = carry
            return feedback(l, fn(l, r)), r
        return body, (l1, r1)

    benches["ssd_cost_512x256_d32"] = cost_bench(
        lambda l, r: ssd_cost_volume(l, r, max_disparity=d1, kernel_size=7))
    benches["ssd_texture_512x256_d32"] = cost_bench(
        lambda l, r: ssd_cost_volume(
            TextureImage.from_array(l).sample_grid(),
            TextureImage.from_array(r).sample_grid(),
            max_disparity=d1, kernel_size=7))
    benches["birchfield_cost_512x256_d32"] = cost_bench(
        lambda l, r: birchfield_cost_volume(l, r, max_disparity=d1))

    def vol_bench(fn):
        def body(carry):
            v, img = carry
            out = fn(v, img)
            flat = out.astype(jnp.float32)
            while flat.ndim > 2:
                flat = flat[..., 0]
            return v + jnp.float32(1e-12) * flat[:, :, None], img
        return body, (vol2, l2)

    benches["sgm_450x375_d128"] = vol_bench(lambda v, img: aggregate(v, img))
    benches["wta_450x375_d128"] = vol_bench(
        lambda v, img: winner_takes_all(v))
    benches["argmin_baseline_450x375_d128"] = vol_bench(
        lambda v, img: jnp.argmin(v, axis=2).astype(jnp.int32))
    # On CPU this times the XLA scan formulation (the Pallas kernel is
    # TPU-only); the reference_ms comparison is only meaningful on TPU.
    benches["dynprog_450x375_d128"] = vol_bench(
        lambda v, img: (dynamic_programming(v) if on_cpu
                        else dynamic_programming_pallas(v)))

    def pipe_body(carry):
        l, r = carry
        vol = ssd_cost_volume(l, r, max_disparity=d2, kernel_size=7)
        agg = aggregate(vol, l)
        disp = winner_takes_all(agg)
        return feedback(l, disp), r

    benches["pipeline_teddy_450x375_d128"] = (pipe_body, (l2, r2))

    # Batched video steady state: 4 frames per step, sequentially mapped
    # inside one jit (stream.StreamingEstimator's compute path; lax.map
    # beats vmap for the Pallas stages).  Reported per BATCH — divide by
    # 4 for per-frame.
    lb = jax.device_put(rng.random((4, h2, w2), np.float32))
    rb = jax.device_put(rng.random((4, h2, w2), np.float32))

    def frame(l, r):
        vol = ssd_cost_volume(l, r, max_disparity=d2, kernel_size=7)
        return winner_takes_all(aggregate(vol, l))

    def batch_body(carry):
        l, r = carry
        disp = jax.lax.map(lambda p: frame(*p), (l, r))
        return l + jnp.float32(1e-12) * disp.astype(jnp.float32), r

    benches["pipeline_batch4_teddy_d128"] = (batch_body, (lb, rb))

    # Production-scale geometry: HD-class pair, D=256 (1.3 GB f32 volume).
    # No reference comparison — the CUDA benchmarks stop at teddy size.
    if not on_cpu:
        h3, w3, d3 = 1024, 1280, 256
        l3 = jax.device_put(rng.random((h3, w3), np.float32))
        r3 = jax.device_put(rng.random((h3, w3), np.float32))

        def hd_body(carry):
            l, r = carry
            vol = ssd_cost_volume(l, r, max_disparity=d3, kernel_size=7)
            disp = winner_takes_all(aggregate(vol, l))
            return feedback(l, disp), r

        benches["pipeline_hd_1024x1280_d256"] = (hd_body, (l3, r3))
    return benches


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--chain", type=int, default=16)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--only", default=None,
                        help="substring filter on benchmark names")
    args = parser.parse_args()

    import jax
    device = jax.devices()[0].device_kind

    results = {}
    print(f"# device: {device}", file=sys.stderr)
    header = f"{'benchmark':36s} {'ms':>9s} {'ref ms':>8s} {'speedup':>8s}"
    print(header, file=sys.stderr)
    for name, (body, init) in build_benchmarks().items():
        if args.only and args.only not in name:
            continue
        ms = _marginal_ms(body, init, args.chain, args.repeats)
        ref = REFERENCE_MS.get(name)
        speed = f"{ref / ms:8.2f}" if ref and ms > 0 else "       -"
        print(f"{name:36s} {ms:9.3f} {ref if ref else float('nan'):8.3f}"
              f" {speed}", file=sys.stderr)
        results[name] = {"ms": round(ms, 4), "reference_ms": ref,
                         "speedup_vs_reference": (round(ref / ms, 3)
                                                  if ref and ms > 0 else None)}

    payload = {"device": device, "results": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
