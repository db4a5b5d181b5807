"""Regenerate the toy-scale golden anchor
(tests/data/golden_sgm_disparity.npz — 96x128, D=32, seed 2026).

Companion to tools/make_golden_teddy.py (the production-geometry anchor);
same contract: arrays come from the XLA scan formulations (the semantic
oracles), with a bad-pixel quality guard so a broken build cannot commit
a golden.  Regenerate ONLY on an intentional, oracle-validated numeric
change (e.g. a summation-order change inside a kernel) and say so in the
commit message — the anchor exists to catch unintentional drift.

Run from the repo root (CPU forced; seconds):
    python tools/make_golden_sgm.py
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HEIGHT, WIDTH, MAX_DISP = 96, 128, 32
SEED, KERNEL, P1, P2 = 2026, 5, 0.1, 0.2
OUT = (pathlib.Path(__file__).resolve().parent.parent
       / "tests" / "data" / "golden_sgm_disparity.npz")


def main():
    from stereomatch_tpu.io.synthetic import stereo_pair
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import (census_hamming_cost_volume,
                                          ssd_cost_volume)
    from stereomatch_tpu.ops.disparity import (dynamic_programming,
                                               winner_takes_all)

    left, right, gt = stereo_pair(HEIGHT, WIDTH, MAX_DISP, SEED)

    vol = ssd_cost_volume(left, right, max_disparity=MAX_DISP,
                          kernel_size=KERNEL)
    agg = semiglobal_aggregate(vol, left, penalty1=P1, penalty2=P2)
    wta = np.asarray(winner_takes_all(agg))
    dp = np.asarray(dynamic_programming(agg))
    bad = float(np.mean((np.abs(wta - gt) > 1)[:, MAX_DISP:]))
    print(f"ssd: bad-pixel vs exact GT = {bad:.4%}")
    assert bad < 0.06, "refusing to commit a golden from a broken build"

    cvol = census_hamming_cost_volume(left, right, max_disparity=MAX_DISP)
    cagg = semiglobal_aggregate(cvol, left, penalty1=P1, penalty2=P2)
    cwta = np.asarray(winner_takes_all(cagg))
    cbad = float(np.mean((np.abs(cwta - gt) > 1)[:, MAX_DISP:]))
    print(f"census: bad-pixel vs exact GT = {cbad:.4%}")
    assert cbad < 0.06

    np.savez_compressed(
        OUT,
        height=HEIGHT, width=WIDTH, max_disparity=MAX_DISP, seed=SEED,
        kernel_size=KERNEL, penalty1=P1, penalty2=P2,
        wta=wta, dp=dp, bad_pixel_vs_gt=bad,
        census_wta=cwta, census_bad_pixel_vs_gt=cbad,
    )
    print(f"wrote {OUT} ({OUT.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
