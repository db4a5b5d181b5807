"""SGM aggregation vs. the path-walking oracle."""

import numpy as np
import pytest

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate

from .oracles import sgm_oracle


def _compare(cost, image, p1=0.1, p2=0.2, rtol=2e-4, atol=2e-4):
    got = np.asarray(semiglobal_aggregate(cost, image,
                                          penalty1=p1, penalty2=p2))
    want = sgm_oracle(cost, image, p1, p2)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_sgm_matches_oracle_square():
    rng = np.random.default_rng(1)
    cost = rng.random((12, 12, 8)).astype(np.float32)
    image = rng.random((12, 12)).astype(np.float32)
    _compare(cost, image)


def test_sgm_matches_oracle_wide():
    rng = np.random.default_rng(2)
    cost = rng.random((7, 19, 8)).astype(np.float32)
    image = rng.random((7, 19)).astype(np.float32)
    _compare(cost, image)


def test_sgm_matches_oracle_tall():
    rng = np.random.default_rng(3)
    cost = rng.random((17, 6, 4)).astype(np.float32)
    image = rng.random((17, 6)).astype(np.float32)
    _compare(cost, image)


def test_sgm_matches_oracle_on_ssd_volume(ssd_cost_small):
    """Realistic volume: SSD costs with +inf invalid cells, like the
    reference's sgm-over-ssd integration test (tests/test_semiglobalmatch.py)."""
    vol = ssd_cost_small.volume
    img = ssd_cost_small.left_image
    _compare(vol, img, rtol=1e-3, atol=1e-3)


def test_sgm_equal_intensities_use_infinite_p2():
    """|dI| = 0 makes P2_adj infinite (semiglobal.cpp:137-138 via IEEE /0),
    dropping the large-jump term."""
    rng = np.random.default_rng(4)
    cost = rng.random((5, 9, 4)).astype(np.float32)
    image = np.ones((5, 9), np.float32)
    _compare(cost, image)


def test_sgm_distinct_penalties():
    rng = np.random.default_rng(5)
    cost = rng.random((9, 9, 8)).astype(np.float32)
    image = rng.random((9, 9)).astype(np.float32)
    _compare(cost, image, p1=0.5, p2=3.0)


def test_sgm_accumulates_eight_sweeps():
    """Uniform cost volume: every sweep contributes C at every pixel when
    penalties cannot help, so output == 8 * C."""
    cost = np.full((6, 6, 4), 2.0, np.float32)
    image = np.arange(36, dtype=np.float32).reshape(6, 6)
    got = np.asarray(semiglobal_aggregate(cost, image))
    np.testing.assert_allclose(got, 16.0, rtol=1e-6)


def test_sgm_integer_volume_dtype_preserved():
    """Integer cost volumes aggregate in f32 and return the input dtype,
    like the reference's dtype-templated kernels (type_dispatch.hpp)."""
    import numpy as np
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 1000, (8, 12, 8)).astype(np.int32)
    img = rng.random((8, 12)).astype(np.float32)
    out = semiglobal_aggregate(vol, img)
    assert out.dtype == np.int32
    ref = np.asarray(semiglobal_aggregate(vol.astype(np.float32), img))
    np.testing.assert_array_equal(np.asarray(out), ref.astype(np.int32))
