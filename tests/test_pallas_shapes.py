"""Shape-robustness sweep for the Pallas kernels (interpret mode).

The streaming kernels pick row-block sizes from divisors of H and rely on
Mosaic's logical-shape handling for non-tile-aligned W and D; this sweep
pins parity with the XLA formulations across awkward geometries: odd
heights (rows_per_step falls back to 1), prime widths, sub-lane and
multi-tile disparity counts.
"""

import numpy as np
import pytest

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.disparity import dynamic_programming, winner_takes_all
from stereomatch_tpu.ops.dp_pallas import dynamic_programming_pallas
from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas

SHAPES = [
    (7, 11, 4),      # tiny, odd H (rows_per_step=1), sub-lane D
    (16, 23, 8),     # prime W
    (9, 16, 16),     # odd H
    (12, 20, 32),    # D spanning multiple sub-lane groups
    (8, 10, 100),    # D not a lane-tile multiple
]


@pytest.fixture(scope="module")
def volumes():
    rng = np.random.default_rng(42)
    out = {}
    for shape in SHAPES:
        h, w, d = shape
        out[shape] = (rng.random((h, w, d)).astype(np.float32),
                      rng.random((h, w)).astype(np.float32))
    return out


@pytest.mark.parametrize("shape", SHAPES)
def test_sgm_pallas_shape_sweep(volumes, shape):
    vol, img = volumes[shape]
    ref = np.asarray(semiglobal_aggregate(vol, img))
    out = np.asarray(semiglobal_aggregate_pallas(vol, img, interpret=True))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(winner_takes_all(out)),
        np.asarray(winner_takes_all(ref)))


@pytest.mark.parametrize("shape", SHAPES)
def test_dp_pallas_shape_sweep(volumes, shape):
    vol, _ = volumes[shape]
    ref = np.asarray(dynamic_programming(vol))
    out = np.asarray(dynamic_programming_pallas(vol, interpret=True))
    np.testing.assert_array_equal(out, ref)
