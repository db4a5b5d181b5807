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


# --------------------------------------------------------------------------
# SAD (beyond-reference cost family, SSD window semantics)
# --------------------------------------------------------------------------

def test_sad_matches_oracle(stereo_pair_small):
    from stereomatch_tpu.ops.cost import sad_cost_volume
    from .oracles import sad_oracle
    left, right = stereo_pair_small
    got = np.asarray(sad_cost_volume(left, right,
                                     max_disparity=pytest.STM_MAX_DISPARITY))
    want = sad_oracle(left, right, pytest.STM_MAX_DISPARITY)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sad_int32_uint8_exact(stereo_pair_small):
    """Integer chain is exact: uint8 inputs, int32 sums, int-max empty."""
    from stereomatch_tpu.ops.cost import sad_cost_volume
    from .oracles import sad_oracle
    left, right = stereo_pair_small
    left8 = (left * 255).astype(np.uint8)
    right8 = (right * 255).astype(np.uint8)
    got = np.asarray(sad_cost_volume(left8, right8, max_disparity=8,
                                     cost_dtype=np.int32))
    want = sad_oracle(left8.astype(np.float32), right8.astype(np.float32), 8)
    expected = np.where(np.isinf(want), np.iinfo(np.int32).max,
                        np.nan_to_num(want, posinf=0)
                        .astype(np.int64)).astype(np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), expected)


def test_sad_disparity_offset(stereo_pair_small):
    from stereomatch_tpu.ops.cost import sad_cost_volume
    left, right = stereo_pair_small
    full = np.asarray(sad_cost_volume(left, right, max_disparity=16))
    block = np.asarray(sad_cost_volume(left, right, max_disparity=8,
                                       disparity_offset=8))
    np.testing.assert_array_equal(block, full[:, :, 8:])


# --------------------------------------------------------------------------
# ZNCC (beyond-reference cost family)
# --------------------------------------------------------------------------

def test_zncc_matches_oracle(stereo_pair_small):
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    from .oracles import zncc_oracle
    left, right = stereo_pair_small
    got = np.asarray(zncc_cost_volume(left, right, max_disparity=8,
                                      kernel_size=3))
    want = zncc_oracle(left, right, 8, kernel_size=3)
    assert np.array_equal(np.isinf(got), np.isinf(want))
    m = ~np.isinf(want)
    np.testing.assert_allclose(got[m], want[m], atol=2e-3)


def test_zncc_affine_invariance(stereo_pair_small):
    """cost(L, a*R + b) == cost(L, R): the whole point of NCC."""
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    left, right = stereo_pair_small
    base = np.asarray(zncc_cost_volume(left, right, max_disparity=8))
    skew = np.asarray(zncc_cost_volume(left, 1.7 * right + 0.3,
                                       max_disparity=8))
    m = ~np.isinf(base)
    np.testing.assert_allclose(skew[m], base[m], atol=1e-3)


def test_zncc_range_and_self_match(stereo_pair_small):
    """Finite costs live in [0, 2]; d=0 on identical images is ~0 where
    the window has texture."""
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    left, _ = stereo_pair_small
    vol = np.asarray(zncc_cost_volume(left, left, max_disparity=8))
    m = ~np.isinf(vol)
    assert vol[m].min() >= -1e-4 and vol[m].max() <= 2 + 1e-4
    np.testing.assert_allclose(vol[:, :, 0], 0.0, atol=1e-3)


def test_zncc_disparity_offset(stereo_pair_small):
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    left, right = stereo_pair_small
    full = np.asarray(zncc_cost_volume(left, right, max_disparity=16))
    block = np.asarray(zncc_cost_volume(left, right, max_disparity=8,
                                        disparity_offset=8))
    np.testing.assert_allclose(block, full[:, :, 8:], atol=1e-5)


def test_zncc_rejects_int_cost_dtype(stereo_pair_small):
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    left, right = stereo_pair_small
    with pytest.raises(ValueError, match="float"):
        zncc_cost_volume(left, right, max_disparity=8, cost_dtype=np.int32)
