"""Extended randomized soak over the round-2 kernel surfaces.

Random trials across: geometry (including odd/prime scan lengths),
volume dtype (f32/bf16), VMEM-knob forcing (w_chunks, mask cache off,
W-on-grid, per-family fallback), cost family (ssd/census), and the
row-sharded pipeline's exact/overlap modes on the virtual CPU mesh —
asserting the documented parity contract for each configuration
(bit-exact where promised, tolerance + WTA agreement elsewhere).

Meant for long unattended runs; the seeded CI soak
(tests/test_differential_soak.py) covers a fixed subset of this space.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python benchmarks/soak_extended.py [--trials N] [--seed S]
"""

import argparse
import os
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# The mesh legs need >= 8 virtual devices; arm the flag before jax
# imports so a bare `python benchmarks/soak_extended.py` works (a run
# without it fails every sharded trial with n_batch-divisibility errors).
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def run_trial(rng, trial):
    from stereomatch_tpu.ops import sgm_pallas
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import (census_hamming_cost_volume,
                                          ssd_cost_volume)
    from stereomatch_tpu.ops.disparity import (dynamic_programming,
                                               winner_takes_all)
    from stereomatch_tpu.ops.dp_pallas import dynamic_programming_pallas

    height = int(rng.integers(6, 40))
    width = int(rng.choice([16, 24, 32, 40, 48, 64]))
    max_disp = int(rng.integers(4, min(width, 24)))
    p1 = float(rng.uniform(0.01, 0.5))
    p2 = float(rng.uniform(p1, 1.5))
    cost_kind = rng.choice(["ssd", "census"])
    dtype = rng.choice(["float32", "bfloat16"])
    left = rng.random((height, width)).astype(np.float32)
    right = rng.random((height, width)).astype(np.float32)

    cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if cost_kind == "ssd":
        vol = ssd_cost_volume(left, right, max_disparity=max_disp,
                              kernel_size=int(rng.integers(1, 5)),
                              cost_dtype=cd)
    else:
        vol = census_hamming_cost_volume(left, right,
                                         max_disparity=max_disp,
                                         window_size=int(rng.choice([3, 5])),
                                         cost_dtype=cd)

    # Random VMEM-knob forcing: exercise every adaptation branch.
    knobs = {}
    mode = rng.choice(["default", "wchunk", "nomask", "wgrid", "perfam"])
    row_bytes = width * max_disp * 4
    if mode == "wchunk":
        knobs["_WCHUNK_TARGET_BYTES"] = 1
    elif mode == "nomask":
        knobs["_MASK_CACHE_MAX_BYTES"] = 0
    elif mode == "wgrid":
        knobs["_VMEM_BUDGET_BYTES"] = 0
        knobs["_WGRID_BUDGET_BYTES"] = 3 * row_bytes + 10 * (row_bytes // 2)
    elif mode == "perfam":
        knobs["_VMEM_BUDGET_BYTES"] = 9 * row_bytes
        knobs["_WGRID_BUDGET_BYTES"] = 0
    saved = {k: getattr(sgm_pallas, k) for k in knobs}
    for k, v in knobs.items():
        setattr(sgm_pallas, k, v)
    try:
        agg_p = np.asarray(
            sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(
                vol, left, penalty1=p1, penalty2=p2, interpret=True))
    finally:
        for k, v in saved.items():
            setattr(sgm_pallas, k, v)

    agg_x = np.asarray(semiglobal_aggregate(vol, left, penalty1=p1,
                                            penalty2=p2))
    finite = np.isfinite(agg_x)
    assert np.array_equal(finite, np.isfinite(agg_p)), "inf structure"
    ax = agg_x[finite].astype(np.float32)
    ap = agg_p[finite].astype(np.float32)
    tol = 2e-2 if dtype == "bfloat16" else 2e-6
    np.testing.assert_allclose(ap, ax, rtol=tol, atol=tol)
    wx = np.asarray(winner_takes_all(agg_x))
    wp = np.asarray(winner_takes_all(agg_p))
    if dtype == "bfloat16":
        assert np.mean(wx != wp) < 0.05, "bf16 WTA divergence"
    else:
        # The documented contract (CLAUDE.md invariants) is last-ulp
        # aggregation agreement and identical WTA on DISTINCT-VALUE
        # volumes.  Random census costs are integer-valued Hamming sums
        # and produce exact ties, where a 1-ulp summation-order
        # difference legitimately flips the argmin — so flips are
        # allowed only at near-ties, and only a few of them.
        flips = wx != wp
        assert np.mean(flips) < 0.005, f"f32 WTA flips {np.mean(flips)}"
        if flips.any():
            ys, xs = np.nonzero(flips)
            gap = np.abs(agg_x[ys, xs, wx[ys, xs]]
                         - agg_x[ys, xs, wp[ys, xs]])
            scale = np.abs(agg_x[ys, xs, wx[ys, xs]]) + 1.0
            assert (gap <= 4e-6 * scale).all(), \
                f"f32 WTA flip away from a tie (gap {gap.max()})"

    # DP parity on the f32 aggregation.
    np.testing.assert_array_equal(
        np.asarray(dynamic_programming(agg_x.astype(np.float32))),
        np.asarray(dynamic_programming_pallas(
            jnp.asarray(agg_x, jnp.float32), interpret=True)))

    # Sharded pipeline spot check (every 4th trial; compiles are slow).
    if trial % 4 == 0 and height % 4 == 0:
        from stereomatch_tpu.parallel import ShardedPipeline, make_mesh
        sgm_mode = rng.choice(["exact", "overlap"])
        mesh = make_mesh(jax.devices()[:8], n_batch=2)
        pipe = ShardedPipeline(
            mesh, max_disp, cost=cost_kind,
            kernel_size=3 if cost_kind == "ssd" else None,
            cost_dtype=cd, aggregation="sgm", reducer="wta",
            sgm_mode=sgm_mode, overlap=height, backend="xla",
            penalty1=p1, penalty2=p2)
        out = np.asarray(pipe.estimate(np.stack([left] * 2),
                                       np.stack([right] * 2)))
        if cost_kind == "ssd":
            vref = ssd_cost_volume(left, right, max_disparity=max_disp,
                                   kernel_size=3, cost_dtype=cd)
        else:
            vref = census_hamming_cost_volume(left, right,
                                              max_disparity=max_disp,
                                              cost_dtype=cd)
        aref = semiglobal_aggregate(vref, left, penalty1=p1, penalty2=p2)
        dref = np.asarray(winner_takes_all(aref))
        mismatch = np.mean(out[0] != dref)
        assert mismatch < (0.05 if dtype == "bfloat16" else 1e-9), \
            f"sharded {sgm_mode} mismatch {mismatch}"

    # Guided cost-volume filtering leg: oracle parity at toy scale on
    # the f32 volume (masked path exercised by SSD's +inf wedge), plus a
    # row-sharded bit-exactness spot check composed with the same trial
    # geometry.
    from stereomatch_tpu.ops.cvf import guided_filter_aggregate
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))
    from oracles import guided_filter_oracle

    # Independent trial-derived stream: the main rng must keep the
    # historical draw order (the validated config space).
    crng = np.random.default_rng(10_000 + trial)
    radius = int(crng.integers(1, 5))
    eps = float(crng.uniform(1e-5, 1e-2))
    vol32 = jnp.asarray(vol, jnp.float32)
    cvf = np.asarray(guided_filter_aggregate(vol32, left, radius=radius,
                                             eps=eps))
    cvf_ref = guided_filter_oracle(np.asarray(vol32), left, radius, eps)
    cmask = np.isfinite(cvf_ref)
    assert np.array_equal(cmask, np.isfinite(cvf)), "cvf inf structure"
    np.testing.assert_allclose(cvf[cmask], cvf_ref[cmask],
                               rtol=5e-4, atol=5e-5)
    if trial % 4 == 1 and height % 4 == 0 and 2 * radius <= height // 4:
        from stereomatch_tpu.parallel import ShardedPipeline, make_mesh
        mesh = make_mesh(jax.devices()[:8], n_batch=2)
        pipe = ShardedPipeline(mesh, max_disp, cost=cost_kind,
                               kernel_size=(3 if cost_kind == "ssd"
                                            else None),
                               aggregation="cvf",
                               cvf_radius=radius, cvf_eps=eps,
                               reducer="wta", backend="xla")
        out = np.asarray(pipe.estimate(np.stack([left] * 2),
                                       np.stack([right] * 2)))
        if cost_kind == "ssd":
            vref = ssd_cost_volume(left, right, max_disparity=max_disp,
                                   kernel_size=3)
        else:
            vref = census_hamming_cost_volume(left, right,
                                              max_disparity=max_disp)
        dref = np.asarray(winner_takes_all(guided_filter_aggregate(
            jnp.asarray(vref, jnp.float32), left, radius=radius, eps=eps)))
        np.testing.assert_array_equal(out[0], dref)

    return dict(h=height, w=width, d=max_disp, cost=cost_kind,
                dtype=dtype, mode=str(mode), cvf_r=radius)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=40)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    failures = 0
    for trial in range(args.trials):
        try:
            info = run_trial(rng, trial)
            print(f"trial {trial:3d} OK {info}", flush=True)
        except Exception:
            failures += 1
            print(f"trial {trial:3d} FAILED", flush=True)
            traceback.print_exc()
    print(f"done: {args.trials - failures}/{args.trials} passed", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
