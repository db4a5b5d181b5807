"""Pallas DP reducer vs the XLA scan formulation (interpret mode on CPU).

The trace is integer-exact, so unlike SGM the two paths must agree
bit-for-bit, including argmin tie-breaks (torch::argmin semantics,
dynamic_programming.cu:207) and band-edge clipping.
"""

import numpy as np
import pytest

from stereomatch_tpu.ops.cost import ssd_cost_volume
from stereomatch_tpu.ops.disparity import dynamic_programming
from stereomatch_tpu.ops.dp_pallas import dynamic_programming_pallas

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.mark.parametrize("seed", [5, 11, 23])
def test_pallas_dp_matches_xla(seed):
    left, right, _ = synthetic_stereo_pair(24, 40, D, seed=seed)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    ref = np.asarray(dynamic_programming(vol))
    out = np.asarray(dynamic_programming_pallas(vol, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_dp_distinct_values():
    """All-distinct volume so any tie-break divergence changes the result."""
    rng = np.random.default_rng(0)
    height, width = 16, 24
    vol = rng.permutation(height * width * D).reshape(
        height, width, D).astype(np.float32)
    ref = np.asarray(dynamic_programming(vol))
    out = np.asarray(dynamic_programming_pallas(vol, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_dp_constant_volume():
    """Uniform costs: every step ties; pointers must all resolve the same
    way in both implementations."""
    vol = np.ones((12, 20, D), np.float32)
    ref = np.asarray(dynamic_programming(vol))
    out = np.asarray(dynamic_programming_pallas(vol, interpret=True))
    np.testing.assert_array_equal(out, ref)
