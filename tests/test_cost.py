"""Cost-volume kernels vs. naive reference-semantics oracles.

Mirrors the reference's equivalence-test pattern (tests/test_cost.py:41-57):
the trivially-correct implementation anchors the optimized one.
"""

import numpy as np
import pytest

from stereomatch_tpu.ops.cost import (birchfield_cost_volume, ssd_cost_volume,
                                      shifted_right_stack)

from .oracles import birchfield_oracle, ssd_oracle


def test_shifted_right_stack():
    rng = np.random.default_rng(0)
    right = rng.standard_normal((5, 9)).astype(np.float32)
    stack = np.asarray(shifted_right_stack(right, 4))
    for d in range(4):
        for w in range(9):
            expected = right[:, w - d] if w >= d else 0.0
            np.testing.assert_array_equal(stack[:, w, d], expected)


def test_ssd_matches_oracle(stereo_pair_small):
    left, right = stereo_pair_small
    got = np.asarray(ssd_cost_volume(left, right,
                                     max_disparity=pytest.STM_MAX_DISPARITY))
    want = ssd_oracle(left, right, pytest.STM_MAX_DISPARITY)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ssd_small_kernel(stereo_pair_small):
    left, right = stereo_pair_small
    got = np.asarray(ssd_cost_volume(left, right, max_disparity=8,
                                     kernel_size=3))
    want = ssd_oracle(left, right, 8, kernel_size=3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ssd_uint8_inputs(stereo_pair_small):
    """uint8 image inputs, as the reference full-res fixture uses
    (tests/conftest.py:62-66)."""
    left, right = stereo_pair_small
    left8 = (left * 255).astype(np.uint8)
    right8 = (right * 255).astype(np.uint8)
    got = np.asarray(ssd_cost_volume(left8, right8, max_disparity=8))
    want = ssd_oracle(left8.astype(np.float32), right8.astype(np.float32), 8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)


def test_ssd_int32_cost_volume(stereo_pair_small):
    """int32 cost volumes use the integer max as the empty value
    (include/stereomatch/numeric.hpp NumericLimits<int>)."""
    left, right = stereo_pair_small
    left8 = (left * 255).astype(np.uint8)
    right8 = (right * 255).astype(np.uint8)
    got = np.asarray(ssd_cost_volume(left8, right8, max_disparity=8,
                                     cost_dtype=np.int32))
    want = ssd_oracle(left8.astype(np.float32), right8.astype(np.float32), 8)
    iinf = np.iinfo(np.int32).max
    np.testing.assert_array_equal(got[np.isinf(want)], iinf)
    np.testing.assert_array_equal(got[~np.isinf(want)],
                                  want[~np.isinf(want)].astype(np.int32))


def test_ssd_invalid_disparities_inf(stereo_pair_small):
    left, right = stereo_pair_small
    got = np.asarray(ssd_cost_volume(left, right, max_disparity=8))
    for col in range(7):
        assert np.all(np.isinf(got[:, col, col + 1:]))
        assert np.all(np.isfinite(got[:, col, :col + 1]))


def test_birchfield_matches_oracle(stereo_pair_small):
    left, right = stereo_pair_small
    got = np.asarray(birchfield_cost_volume(
        left, right, max_disparity=pytest.STM_MAX_DISPARITY))
    want = birchfield_oracle(left, right, pytest.STM_MAX_DISPARITY)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_birchfield_zero_cost_for_identical_images(stereo_pair_small):
    left, _ = stereo_pair_small
    got = np.asarray(birchfield_cost_volume(left, left, max_disparity=4))
    np.testing.assert_allclose(got[:, 4:, 0], 0.0, atol=1e-6)
