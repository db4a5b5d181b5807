"""Differentiable SGM surface + gradient penalty tuning (ops/soft.py, tune.py).

Beyond the reference's capability surface (its README states "The
operations aren't differentiable", README.md:25).  The load-bearing claims:
the differentiable aggregation is bit-identical to the oracle formulation
in the forward pass, its penalty gradients are finite (the inf/where
cotangent traps are defused), and descending the soft loss actually
improves the *hard* pipeline's bad-pixel rate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
from stereomatch_tpu.ops.cost import census_hamming_cost_volume
from stereomatch_tpu.ops.disparity import winner_takes_all
from stereomatch_tpu.ops.soft import semiglobal_aggregate_diff, soft_argmin

from .conftest import synthetic_stereo_pair

D = 16


@pytest.fixture(scope="module")
def scene():
    return synthetic_stereo_pair(32, 48, D, seed=5)


def test_diff_aggregate_bit_identical(scene):
    """Forward pass == the oracle XLA formulation, bit for bit — including
    flat image regions (P2 / |dI| = 0 division) and diagonal edge
    re-seeds."""
    left, right, _ = scene
    vol = census_hamming_cost_volume(left, right, max_disparity=D)
    flat = np.array(left)
    flat[5:9, :] = 0.5                      # exercise the /0 adaptive P2
    hard = np.asarray(semiglobal_aggregate(vol, flat,
                                           penalty1=0.1, penalty2=0.2))
    diff = np.asarray(semiglobal_aggregate_diff(vol, flat, 0.1, 0.2))
    np.testing.assert_array_equal(hard, diff)


def test_diff_aggregate_traced_penalties_one_compile(scene):
    """Penalties are traced: different values reuse one compilation and
    change the result."""
    left, right, _ = scene
    vol = census_hamming_cost_volume(left, right, max_disparity=D)
    a = np.asarray(semiglobal_aggregate_diff(vol, left, 0.1, 0.2))
    b = np.asarray(semiglobal_aggregate_diff(vol, left, 2.0, 4.0))
    assert not np.array_equal(a, b)
    ref = np.asarray(semiglobal_aggregate(vol, left,
                                          penalty1=2.0, penalty2=4.0))
    np.testing.assert_array_equal(b, ref)


def test_penalty_gradients_finite_and_nonzero(scene):
    left, right, gt = scene
    vol = census_hamming_cost_volume(left, right, max_disparity=D)
    flat = np.array(left)
    flat[5:9, :] = 0.5
    mask = np.zeros(gt.shape, bool)
    mask[:, D:] = True

    def loss(params):
        p1, p2 = params
        agg = semiglobal_aggregate_diff(vol, flat, p1, p2)
        disp = soft_argmin(agg, 1.0)
        return jnp.mean(jnp.where(mask, (disp - gt) ** 2, 0.0))

    g = jax.grad(loss)(jnp.array([0.1, 0.2], jnp.float32))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert bool(jnp.all(g != 0.0))


def test_soft_argmin_approaches_wta():
    """On a distinct-value volume, low temperature recovers the hard
    argmin; +inf invalid cells get exactly zero weight."""
    rng = np.random.default_rng(0)
    v = rng.permutation(24 * 32 * D).reshape(24, 32, D).astype(np.float32)
    v[:, :4, 4:] = np.inf                   # invalid-disparity convention
    soft = np.asarray(soft_argmin(v, 1e-2))
    hard = np.asarray(winner_takes_all(v))
    np.testing.assert_array_equal(np.round(soft).astype(np.int32), hard)
    assert np.all(soft[:, :4] <= 3 + 1e-3)  # inf cells carried no weight


def test_tune_census_improves_hard_pipeline():
    """Descending the soft loss improves the *hard* WTA pipeline: the
    reference's P1/P2 defaults are scaled for [0,1]-image SSD costs and
    are far too small for integer Hamming costs — tuning finds the right
    scale from data."""
    from stereomatch_tpu import tune
    from stereomatch_tpu.cli_common import create_pipeline

    train = [synthetic_stereo_pair(32, 64, D, seed=s) for s in (7, 8)]
    res = tune.tune_penalties(train, max_disparity=D, cost="census",
                              steps=40, tau=0.5, learning_rate=0.1)
    assert res.penalty1 > 0 and res.penalty2 > 0
    assert res.loss_history[-1] < res.loss_history[0]
    assert res.penalty_history.shape == (40, 2)

    def bad(p1, p2, scene):
        left, right, gt = scene
        pipe = create_pipeline("census", "wta", "sgm", max_disparity=D,
                               penalty1=p1, penalty2=p2)
        d = np.asarray(pipe.estimate(left, right))
        return np.mean((np.abs(d - gt) > 1)[:, D:])

    held_out = synthetic_stereo_pair(32, 64, D, seed=99)
    for scene in (train[0], held_out):
        assert bad(res.penalty1, res.penalty2, scene) < bad(0.1, 0.2, scene)
