"""Hardware parity tests — run only when a TPU-class backend is present.

The regular suite forces the CPU backend (conftest), where Pallas runs in
interpret mode and these tests auto-skip; set ``STM_TEST_ON_TPU=1`` to
leave the accelerator backend selected and compile the real Mosaic
kernels + shard_map compositions:

    STM_TEST_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
"""

import numpy as np
import pytest


def _tpu_available():
    import jax
    try:
        return jax.devices()[0].platform != "cpu"
    except RuntimeError:
        return False


@pytest.fixture(scope="module")
def fixtures():
    if not _tpu_available():
        pytest.skip("no accelerator backend")
    import jax
    from .conftest import synthetic_stereo_pair
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas
    from stereomatch_tpu.ops.disparity import winner_takes_all

    D = 32
    left, right, _ = synthetic_stereo_pair(64, 96, D, seed=3)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    agg = semiglobal_aggregate_pallas(vol, left)
    ref = np.asarray(winner_takes_all(agg))
    return D, left, right, vol, agg, ref


def test_pallas_sgm_matches_xla_on_hardware(fixtures):
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.disparity import winner_takes_all
    D, left, right, vol, agg, ref = fixtures
    xla = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    np.testing.assert_array_equal(ref, xla)


def test_pallas_dp_matches_xla_on_hardware(fixtures):
    from stereomatch_tpu.ops.disparity import dynamic_programming
    from stereomatch_tpu.ops.dp_pallas import dynamic_programming_pallas
    _, _, _, _, agg, _ = fixtures
    np.testing.assert_array_equal(
        np.asarray(dynamic_programming_pallas(agg)),
        np.asarray(dynamic_programming(agg)))


@pytest.mark.parametrize("mode", ["exact", "overlap"])
def test_sharded_pallas_on_hardware(fixtures, mode):
    import jax
    from stereomatch_tpu.parallel import ShardedPipeline, make_mesh
    D, left, right, _, _, ref = fixtures
    mesh = make_mesh(jax.devices()[:1])
    pipe = ShardedPipeline(mesh, D, kernel_size=3, aggregation="sgm",
                           reducer="wta", sgm_mode=mode,
                           overlap=left.shape[0], backend="pallas")
    out = np.asarray(pipe.estimate(left[None], right[None]))
    np.testing.assert_array_equal(out[0], ref)


def test_tiled2d_pallas_on_hardware(fixtures):
    import jax
    from stereomatch_tpu.parallel import make_mesh_2d, make_tiled2d_estimate
    D, left, right, _, _, ref = fixtures
    mesh2 = make_mesh_2d(jax.devices()[:1], n_batch=1, n_tile=1, n_tile_w=1)
    fn = make_tiled2d_estimate(mesh2, max_disparity=D, kernel_size=3,
                               overlap=max(left.shape), backend="pallas")
    out = np.asarray(fn(left[None], right[None]))
    np.testing.assert_array_equal(out[0], ref)
