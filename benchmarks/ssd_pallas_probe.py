"""Hardware probe for the streaming Pallas SSD kernel.

Measures XLA vs Pallas SSD at the reference geometries plus the full f32
pipeline with each, using the marginal-cost methodology
(utils/benchmarking.py).  Writes one JSON blob to stdout.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas
    from stereomatch_tpu.ops.ssd_pallas import (ssd_cost_volume_pallas,
                                                ssd_pallas_supported)
    from stereomatch_tpu.utils.benchmarking import marginal_ms

    on_cpu = jax.default_backend() == "cpu"
    aggregate = (semiglobal_aggregate if on_cpu
                 else semiglobal_aggregate_pallas)
    interp = on_cpu
    results = {
        "device": jax.devices()[0].device_kind,
        "methodology": "marginal_ms (utils/benchmarking.py), chain K=8, "
                       "5 repeats",
    }

    def feed(img, disp):
        return img + jnp.float32(1e-12) * disp.astype(jnp.float32)

    rng = np.random.default_rng(0)

    # --- correctness spot-check on hardware (not interpret mode) ---
    H, W, D, K = 64, 96, 32, 7
    L = jax.device_put(rng.random((H, W), np.float32))
    R = jax.device_put(rng.random((H, W), np.float32))
    ref = np.asarray(ssd_cost_volume(L, R, max_disparity=D, kernel_size=K))
    out = np.asarray(ssd_cost_volume_pallas(L, R, max_disparity=D,
                                            kernel_size=K, interpret=interp))
    fin = ref != np.inf
    rel = float((np.abs(ref[fin] - out[fin]) /
                 np.maximum(np.abs(ref[fin]), 1e-30)).max())
    results["hw_parity_64x96_d32_k7"] = {
        "inf_ok": bool(((ref == np.inf) == (out == np.inf)).all()),
        "max_rel": rel,
    }
    print(f"hw parity: {results['hw_parity_64x96_d32_k7']}",
          file=sys.stderr, flush=True)

    for name, (h, w, d, k) in {
        "512x256_d32": (256, 512, 32, 7),
        "teddy_450x375_d128": (375, 450, 128, 7),
    }.items():
        L = jax.device_put(rng.random((h, w), np.float32))
        R = jax.device_put(rng.random((h, w), np.float32))
        assert ssd_pallas_supported(h, w, d, k), name

        def body_x(c, R=R, d=d, k=k):
            img, disp = c
            v = ssd_cost_volume(img, R, max_disparity=d, kernel_size=k)
            disp = jnp.min(v, axis=2).astype(jnp.int32)
            return (feed(img, disp), disp)

        def body_p(c, R=R, d=d, k=k):
            img, disp = c
            v = ssd_cost_volume_pallas(img, R, max_disparity=d,
                                       kernel_size=k, interpret=interp)
            disp = jnp.min(v, axis=2).astype(jnp.int32)
            return (feed(img, disp), disp)

        args = (L, jnp.zeros((h, w), jnp.int32))
        results[f"ssd_xla_{name}"] = marginal_ms(body_x, args)
        print(f"ssd_xla_{name}: {results[f'ssd_xla_{name}']:.3f} ms",
              file=sys.stderr, flush=True)
        results[f"ssd_pallas_{name}"] = marginal_ms(body_p, args)
        print(f"ssd_pallas_{name}: {results[f'ssd_pallas_{name}']:.3f} ms",
              file=sys.stderr, flush=True)

    # --- D=64 lane-alignment sweep: the measurements behind the
    # ssd_pallas_preferred gate (W % 128 alignment and the D octave are
    # the two discriminators; names are the gate docstring's labels) ---
    for name, (h, w, d, k) in {
        "450x375_d64": (375, 450, 64, 7),    # teddy W=450: W % 128 != 0
        "512x256_d64": (256, 512, 64, 7),
        "375x384_d64": (375, 384, 64, 7),    # W % 128 == 0
        "375x512_d64": (375, 512, 64, 7),    # W % 128 == 0
        "375x448_d64": (375, 448, 64, 7),    # W % 128 != 0
        "256x384_d32": (256, 384, 32, 7),
    }.items():
        if not ssd_pallas_supported(h, w, d, k):
            continue
        L = jax.device_put(rng.random((h, w), np.float32))
        R = jax.device_put(rng.random((h, w), np.float32))

        def body_x(c, R=R, d=d, k=k):
            img, disp = c
            v = ssd_cost_volume(img, R, max_disparity=d, kernel_size=k)
            return (feed(img, jnp.min(v, axis=2).astype(jnp.int32)), disp)

        def body_p(c, R=R, d=d, k=k):
            img, disp = c
            v = ssd_cost_volume_pallas(img, R, max_disparity=d,
                                       kernel_size=k, interpret=interp)
            return (feed(img, jnp.min(v, axis=2).astype(jnp.int32)), disp)

        args = (L, jnp.zeros((h, w), jnp.int32))
        results[f"xla_{name}"] = marginal_ms(body_x, args)
        results[f"pallas_{name}"] = marginal_ms(body_p, args)
        print(f"{name}: xla {results[f'xla_{name}']:.3f} ms, "
              f"pallas {results[f'pallas_{name}']:.3f} ms",
              file=sys.stderr, flush=True)

    # --- full f32 pipeline, XLA SSD vs Pallas SSD ---
    h, w, d, k = 375, 450, 128, 7
    L = jax.device_put(rng.random((h, w), np.float32))
    R = jax.device_put(rng.random((h, w), np.float32))

    def pipe(cost_fn):
        def body(c):
            img, disp = c
            v = cost_fn(img, R)
            a = aggregate(v, img)
            disp = winner_takes_all(a)
            return (feed(img, disp), disp)
        return body

    args = (L, jnp.zeros((h, w), jnp.int32))
    results["pipeline_xla_ssd"] = marginal_ms(
        pipe(lambda a, b: ssd_cost_volume(a, b, max_disparity=d,
                                          kernel_size=k)), args)
    print(f"pipeline_xla_ssd: {results['pipeline_xla_ssd']:.3f} ms",
          file=sys.stderr, flush=True)
    results["pipeline_pallas_ssd"] = marginal_ms(
        pipe(lambda a, b: ssd_cost_volume_pallas(a, b, max_disparity=d,
                                                 kernel_size=k,
                                                 interpret=interp)), args)
    print(f"pipeline_pallas_ssd: {results['pipeline_pallas_ssd']:.3f} ms",
          file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
