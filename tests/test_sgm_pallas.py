"""Pallas SGM kernels vs the XLA scan formulation (interpret mode on CPU).

Oracle pattern per the reference's CPU<->GPU equivalence tests
(tests/test_semiglobalmatch.py:39-55): the lax.scan implementation is the
trusted one; the streaming Pallas kernels must agree to float summation
order — same finite/infinite structure, last-ulp value agreement, and
identical WTA disparities.
"""

import numpy as np
import pytest

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.cost import ssd_cost_volume
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def volumes():
    left, right, _ = synthetic_stereo_pair(24, 40, D, seed=5)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    return vol, left


def test_pallas_matches_xla_values(volumes):
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate(vol, left))
    out = np.asarray(semiglobal_aggregate_pallas(vol, left, interpret=True))
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(out))
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize("seed", [5, 11, 23])
def test_pallas_matches_xla_disparities(seed):
    left, right, _ = synthetic_stereo_pair(24, 40, D, seed=seed)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    ref = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    out = np.asarray(winner_takes_all(
        semiglobal_aggregate_pallas(vol, left, interpret=True)))
    np.testing.assert_array_equal(out, ref)


def test_pallas_nondefault_penalties(volumes):
    vol, left = volumes
    ref = np.asarray(semiglobal_aggregate(vol, left, penalty1=0.3,
                                          penalty2=0.9))
    out = np.asarray(semiglobal_aggregate_pallas(vol, left, penalty1=0.3,
                                                 penalty2=0.9,
                                                 interpret=True))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-6, atol=1e-5)


def test_pallas_distinct_value_tiebreak():
    """All-distinct volume (reference test design, test_semiglobalmatch.py:44-47)
    so any reduction-order difference would change the argmin."""
    rng = np.random.default_rng(0)
    height, width = 16, 24
    vol = rng.permutation(height * width * D).reshape(
        height, width, D).astype(np.float32)
    left = rng.random((height, width), np.float32)
    ref = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    out = np.asarray(winner_takes_all(
        semiglobal_aggregate_pallas(vol, left, interpret=True)))
    np.testing.assert_array_equal(out, ref)
