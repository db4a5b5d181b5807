"""Census-transform + Hamming cost family (beyond the reference surface)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.cost import Census
from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.cost import (census_hamming_cost_volume,
                                      census_transform, ssd_cost_volume)
from stereomatch_tpu.ops.disparity import winner_takes_all

from .conftest import synthetic_stereo_pair
from .oracles import census_oracle


@pytest.mark.parametrize("seed,window", [(3, 3), (9, 5), (11, 7)])
def test_census_cost_matches_oracle(seed, window):
    rng = np.random.default_rng(seed)
    left = rng.random((10, 14), np.float32)
    right = rng.random((10, 14), np.float32)
    vol = np.asarray(census_hamming_cost_volume(left, right,
                                                max_disparity=6,
                                                window_size=window))
    ref = census_oracle(left, right, 6, window)
    mask = np.isfinite(ref)
    assert np.array_equal(mask, np.isfinite(vol))
    np.testing.assert_array_equal(vol[mask], ref[mask])


def test_census_windowed_cost_matches_oracle():
    rng = np.random.default_rng(5)
    left = rng.random((9, 12), np.float32)
    right = rng.random((9, 12), np.float32)
    vol = np.asarray(census_hamming_cost_volume(left, right,
                                                max_disparity=5,
                                                window_size=3,
                                                kernel_size=2))
    ref = census_oracle(left, right, 5, 3, kernel_size=2)
    mask = np.isfinite(ref)
    np.testing.assert_array_equal(vol[mask], ref[mask])


def test_census_codes_are_monotonic_invariant():
    """The defining property: any strictly increasing intensity transform
    leaves the census codes — and hence the whole cost volume — EXACTLY
    unchanged.  (SSD has no such invariance.)"""
    rng = np.random.default_rng(0)
    img = rng.random((16, 20), np.float32) + 0.1
    gamma = (img ** 2.2).astype(np.float32)       # strictly increasing
    np.testing.assert_array_equal(np.asarray(census_transform(img)),
                                  np.asarray(census_transform(gamma)))


def test_census_pipeline_survives_radiometric_mismatch():
    """Exposure mismatch between the two cameras: census+SGM still
    recovers the scene where SSD collapses."""
    D = 16
    left, right, gt = synthetic_stereo_pair(48, 64, D, seed=23)
    right_gamma = (right ** 2.2).astype(np.float32)   # mismatched camera

    def bad(vol):
        agg = semiglobal_aggregate(jnp.asarray(vol, jnp.float32), left)
        disp = np.asarray(winner_takes_all(agg))
        return np.mean((np.abs(disp - gt) > 1)[:, D:])

    census_bad = bad(census_hamming_cost_volume(left, right_gamma,
                                                max_disparity=D))
    ssd_bad = bad(ssd_cost_volume(left, right_gamma, max_disparity=D,
                                  kernel_size=3))
    assert census_bad < 0.15
    assert census_bad < ssd_bad / 2


def test_census_api_and_registry():
    from stereomatch_tpu.cli_common import create_pipeline
    D = 8
    left, right, _ = synthetic_stereo_pair(24, 32, D, seed=2)
    pipe = create_pipeline("census", "wta", "sgm", max_disparity=D)
    assert isinstance(pipe.cost, Census)
    disp = np.asarray(pipe.estimate(left, right))
    assert disp.shape == left.shape and disp.dtype == np.int32

    vol16 = Census(D, cost_volume_dtype=jnp.bfloat16)(left, right)
    assert vol16.dtype == jnp.bfloat16
    voli = Census(D, cost_volume_dtype=jnp.int32)(left, right)
    assert voli.dtype == jnp.int32
    assert np.asarray(voli)[0, 0, 1:].max() == np.iinfo(np.int32).max


def test_census_window_validation():
    with pytest.raises(ValueError):
        census_transform(np.zeros((4, 4), np.float32), window_size=4)


def test_census_multiword_codes():
    """Windows above 5x5 pack into several int32 words; the low word of a
    7x7 code agrees bit-for-bit with the first 32 neighbor comparisons,
    and identical images yield zero Hamming cost everywhere valid."""
    rng = np.random.default_rng(4)
    img = rng.random((12, 15), np.float32)
    codes7 = np.asarray(census_transform(img, window_size=7))
    assert codes7.shape == (12, 15, 2)      # 48 bits -> 2 words
    codes9 = np.asarray(census_transform(img, window_size=9))
    assert codes9.shape == (12, 15, 3)      # 80 bits -> 3 words

    vol = np.asarray(census_hamming_cost_volume(img, img, max_disparity=4,
                                                window_size=7))
    finite = np.isfinite(vol)
    np.testing.assert_array_equal(vol[..., 0], 0.0)   # d=0: same pixel
    assert (vol[finite] >= 0).all()


def test_census_multiword_monotonic_invariant():
    rng = np.random.default_rng(6)
    img = rng.random((10, 12), np.float32) + 0.1
    gamma = (img ** 2.2).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(census_transform(img, window_size=7)),
        np.asarray(census_transform(gamma, window_size=7)))
