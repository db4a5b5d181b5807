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


def test_wgrid_sweep_on_hardware(fixtures, monkeypatch):
    """The W-on-grid sweep (HD VMEM mode) compiled by real Mosaic at toy
    shape via forced budgets — bit-matches the full-width kernel.

    horizontal="transposed" on BOTH sides: the zeroed VMEM budget also
    disables the natural horizontal mode, and this test pins the row
    kernels' W-on-grid chunking, not the horizontal-mode choice."""
    from stereomatch_tpu.ops import sgm_pallas
    _, left, _, vol, _, _ = fixtures
    ref = np.asarray(sgm_pallas.semiglobal_aggregate_pallas(
        vol, left, horizontal="transposed"))
    monkeypatch.setattr(sgm_pallas, "_VMEM_BUDGET_BYTES", 0)
    # Budget math uses padded (8, 128) VMEM tiles — size the forced cap
    # with the same model or no chunk count fits (D=32 pads 4x).
    row_bytes = sgm_pallas._row_vmem_bytes(vol.shape[1], vol.shape[2])
    monkeypatch.setattr(sgm_pallas, "_WGRID_BUDGET_BYTES",
                        3 * row_bytes + 10 * (row_bytes // 2))
    assert sgm_pallas._pick_wgrid_chunks(vol.shape[1], vol.shape[2], 3) == 2
    out = np.asarray(sgm_pallas.semiglobal_aggregate_pallas.__wrapped__(
        vol, left, horizontal="transposed"))
    np.testing.assert_array_equal(out, ref)


def test_wgrid_chunk_carry_on_hardware(fixtures, monkeypatch):
    """The W-on-grid exact-hand-off chunk kernel (resident carry I/O) on
    real Mosaic — bit-matches the full-width chunk kernel."""
    import jax.numpy as jnp
    from stereomatch_tpu.ops import sgm_pallas
    _, left, _, vol, _, _ = fixtures
    fams = sgm_pallas._FAMILY_SHIFTS
    pm = sgm_pallas._p2_maps(jnp.asarray(left, jnp.float32), 0.1, 0.2,
                             fams, reverse=False)
    carry = jnp.full((3,) + vol.shape[1:], jnp.inf, jnp.float32)
    ref_out, ref_fin = sgm_pallas.sweep_chunk_with_carry(
        vol, pm, carry, True, families=fams, penalty1=0.1, reverse=False)
    wo, wf = sgm_pallas._sweep_chunk_with_carry_wgrid(
        vol, pm, carry, True, families=fams, penalty1=0.1, reverse=False,
        n_wchunks=2, interpret=False, out_vma=None)
    np.testing.assert_array_equal(np.asarray(wo), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(wf), np.asarray(ref_fin))


def test_prime_height_padding_on_hardware(fixtures):
    """The zero-row scan-padding path compiled by real Mosaic: a prime
    height must match the XLA formulation's disparities."""
    from .conftest import synthetic_stereo_pair
    from stereomatch_tpu.ops import sgm_pallas
    from stereomatch_tpu.ops.aggregation import semiglobal_aggregate
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    D = 32
    left, right, _ = synthetic_stereo_pair(61, 96, D, seed=7)
    vol = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3)
    c, _, h = sgm_pallas._maybe_pad_rows(vol, left.astype(np.float32), 3)
    assert c.shape[0] % 8 == 0 and h == 61
    out = np.asarray(winner_takes_all(
        sgm_pallas.semiglobal_aggregate_pallas(vol, left)))
    ref = np.asarray(winner_takes_all(semiglobal_aggregate(vol, left)))
    np.testing.assert_array_equal(out, ref)


def test_bf16_pipeline_on_hardware(fixtures):
    """bf16 volume streaming end-to-end on the chip: dtype survives and
    disparities track the f32 path."""
    import jax.numpy as jnp
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas
    D, left, right, _, _, ref = fixtures
    vol16 = ssd_cost_volume(left, right, max_disparity=D, kernel_size=3,
                            cost_dtype=jnp.bfloat16)
    agg16 = semiglobal_aggregate_pallas(vol16, left)
    assert agg16.dtype == jnp.bfloat16
    d16 = np.asarray(winner_takes_all(agg16))
    assert np.mean(d16 != ref) < 0.05


def test_pyramid_sharded_on_hardware(fixtures):
    """The row-sharded coarse-to-fine pyramid (coarse Pallas SGM with
    exact hand-off, band scan, median) compiles and runs on real Mosaic
    via a 1-device mesh, matching the single-chip pyramid."""
    import jax
    from stereomatch_tpu.parallel import make_mesh, make_pyramid_sharded_estimate
    from stereomatch_tpu.pyramid import PyramidPipeline
    D, left, right, _, _, _ = fixtures
    ref = np.asarray(PyramidPipeline(D, levels=1,
                                     backend="pallas").estimate(left, right))
    mesh = make_mesh(jax.devices()[:1])
    fn = make_pyramid_sharded_estimate(mesh, max_disparity=D, levels=1,
                                       backend="pallas")
    out = np.asarray(fn(left[None], right[None]))
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_postprocessing_on_hardware(fixtures):
    """Mesh post-processing (median + sub-pixel + speckle) on the chip:
    the one-hot/min-sweep/shift formulations compile on real Mosaic and
    match the single-chip refined output."""
    import jax
    from stereomatch_tpu.ops.refine import filter_speckles
    from stereomatch_tpu.parallel import ShardedPipeline, make_mesh
    from stereomatch_tpu.cli_common import create_pipeline
    D, left, right, _, _, _ = fixtures
    single = create_pipeline("ssd", "wta", "sgm", max_disparity=D,
                             backend="pallas")
    single.cost.kernel_size = 3
    ref = np.asarray(single.estimate_refined(left, right, subpixel=True,
                                             median=True))
    ref = np.asarray(filter_speckles(ref, fill="background"))
    mesh = make_mesh(jax.devices()[:1])
    pipe = ShardedPipeline(mesh, D, kernel_size=3, aggregation="sgm",
                           reducer="wta", backend="pallas",
                           median=True, subpixel=True,
                           speckle=True, speckle_fill="background")
    out = np.asarray(pipe.estimate(left[None], right[None]))
    np.testing.assert_allclose(out[0], ref, atol=1e-4)


def test_cvf_on_hardware(fixtures):
    """Guided cost-volume filtering on the chip: the masked reduce_window
    formulation compiles on the accelerator and its WTA disparities match
    the CPU run exactly on a distinct-argmin volume (f32 box sums are
    order-deterministic per backend; disparities are integer-robust)."""
    import jax
    from stereomatch_tpu.ops.cvf import guided_filter_aggregate
    from stereomatch_tpu.ops.disparity import winner_takes_all
    D, left, right, vol, _, _ = fixtures
    out = np.asarray(winner_takes_all(guided_filter_aggregate(
        vol, left, radius=4)))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vol_c = jax.device_put(np.asarray(vol), cpu)
        left_c = jax.device_put(np.asarray(left), cpu)
        ref = np.asarray(winner_takes_all(guided_filter_aggregate(
            vol_c, left_c, radius=4)))
    assert (out != ref).mean() < 0.005   # last-ulp argmin flips only


def test_wmf_and_volume_lr_on_hardware(fixtures):
    """Weighted median + volume-mode LR on the chip: the lane-axis
    weighted histogram and the dynamic_slice plane loops compile on the
    accelerator and match the CPU backend exactly (selections and
    integer argmins over identical f32 inputs)."""
    import jax
    from stereomatch_tpu.ops.refine import (right_disparity_from_volume,
                                            weighted_median_filter)
    from stereomatch_tpu.ops.disparity import winner_takes_all
    D, left, _, _, agg, _ = fixtures
    disp = winner_takes_all(agg)
    out_wmf = np.asarray(weighted_median_filter(disp, left, sigma=0.1,
                                                n_bins=D))
    out_r = np.asarray(right_disparity_from_volume(agg))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        agg_c = jax.device_put(np.asarray(agg), cpu)
        left_c = jax.device_put(np.asarray(left), cpu)
        disp_c = winner_takes_all(agg_c)
        ref_wmf = np.asarray(weighted_median_filter(disp_c, left_c,
                                                    sigma=0.1, n_bins=D))
        ref_r = np.asarray(right_disparity_from_volume(agg_c))
    # exp() affinities may differ in the last ulp across backends, which
    # can flip the median bin exactly at a cumulative-weight tie; same
    # rationale for the re-indexed argmin at aggregation ties.
    assert (out_wmf != ref_wmf).mean() < 0.005
    assert (out_r != ref_r).mean() < 0.005


def test_natural_horizontal_on_hardware(fixtures):
    """Natural vs transposed horizontal mode on the real Mosaic lowering,
    including a ragged W (58 = 3 chunks of 16 + guarded tail at cw=16,
    or 7x8+2 at cw=8): identical WTA, last-ulp aggregation."""
    from .conftest import synthetic_stereo_pair
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    from stereomatch_tpu.ops.disparity import winner_takes_all
    from stereomatch_tpu.ops.sgm_pallas import semiglobal_aggregate_pallas

    left, right, _ = synthetic_stereo_pair(48, 58, 32, seed=5)
    vol = ssd_cost_volume(left, right, max_disparity=32, kernel_size=3)
    nat = semiglobal_aggregate_pallas(vol, left, horizontal="natural")
    tra = semiglobal_aggregate_pallas(vol, left, horizontal="transposed")
    a, b = np.asarray(nat), np.asarray(tra)
    fin = np.isfinite(b)
    assert np.array_equal(fin, np.isfinite(a))
    np.testing.assert_allclose(a[fin], b[fin], rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(winner_takes_all(nat)),
                                  np.asarray(winner_takes_all(tra)))


def test_mxu_box_parity_on_hardware(fixtures):
    """The MXU banded-matmul box pass (HIGHEST precision) against the
    reduce_window lowering on real hardware — the f32 SSD volumes must
    agree inside the oracle tolerance, and the integer chain must stay
    bit-exact (it never routes through the MXU)."""
    import jax.numpy as jnp
    from stereomatch_tpu.ops import cost as cost_mod
    from .conftest import synthetic_stereo_pair

    left, right, _ = synthetic_stereo_pair(40, 64, 16, seed=9)
    f32 = np.asarray(cost_mod.ssd_cost_volume(left, right,
                                              max_disparity=16,
                                              kernel_size=5))
    # Force the reduce_window path by raising the gate past H.
    old = cost_mod._BOX_MXU_MAX_N
    try:
        cost_mod._BOX_MXU_MAX_N = 0
        ref = np.asarray(cost_mod.ssd_cost_volume.__wrapped__(
            jnp.asarray(left), jnp.asarray(right), max_disparity=16,
            kernel_size=5))
    finally:
        cost_mod._BOX_MXU_MAX_N = old
    fin = np.isfinite(ref)
    assert np.array_equal(fin, np.isfinite(f32))
    np.testing.assert_allclose(f32[fin], ref[fin], rtol=2e-6, atol=2e-5)

    lu = (left * 255).astype(np.uint8)
    ru = (right * 255).astype(np.uint8)
    iv = np.asarray(cost_mod.ssd_cost_volume(lu, ru, max_disparity=16,
                                             kernel_size=5,
                                             cost_dtype=np.int32))
    assert iv.dtype == np.int32


def test_zncc_plane_formulation_on_hardware(fixtures):
    """The restructured ZNCC (prefix-difference planes + one volume box)
    compiled for real: finite range [0, 2], +inf placement, and the d=0
    self-match near zero."""
    from stereomatch_tpu.ops.cost import zncc_cost_volume
    from .conftest import synthetic_stereo_pair

    left, _, _ = synthetic_stereo_pair(48, 64, 16, seed=4)
    vol = np.asarray(zncc_cost_volume(left, left, max_disparity=16,
                                      kernel_size=5))
    m = ~np.isinf(vol)
    assert vol[m].min() >= -1e-3 and vol[m].max() <= 2 + 1e-3
    np.testing.assert_allclose(vol[:, :, 0], 0.0, atol=2e-3)


def test_fused_wedge_cvf_on_hardware(fixtures):
    """The fused wedge-CVF Pallas kernel (round 4) compiles through
    Mosaic on the chip and tracks the XLA wedge path: near-identical
    values (association-level) and matching WTA picks away from ties.
    This is the kernel guided_filter_aggregate dispatches to on TPU for
    registry pipelines at teddy-class geometries."""
    import jax
    from stereomatch_tpu.ops import cvf as cvf_mod
    from stereomatch_tpu.ops.cvf_pallas import guided_filter_wedge_pallas
    from stereomatch_tpu.ops.disparity import winner_takes_all
    D, left, right, vol, _, _ = fixtures
    # The public API dispatches to the fused kernel on TPU, so the
    # reference must invoke the XLA wedge body directly.
    ref_vol = jax.jit(lambda v, g: cvf_mod._filter_body_wedge(
        v, g, 4, 1e-4, 0))(vol, left)
    got_vol = guided_filter_wedge_pallas(vol, left, radius=4)
    ref = np.asarray(ref_vol)
    got = np.asarray(got_vol)
    assert np.array_equal(np.isinf(got), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-5)
    dr = np.asarray(winner_takes_all(ref_vol))
    dg = np.asarray(winner_takes_all(got_vol))
    assert (dr == dg).mean() > 0.995


def test_cvf_layouts_on_hardware(fixtures):
    """Round-5 kernel layouts compile through Mosaic on the chip and
    agree: the raw-volume refs layout (clamped index maps, in-VMEM
    pad/mask/row-gate) must be bit-equal to the pre-padded refs layout,
    and the W-chunked kernel (the HD fallback) must track the XLA wedge
    path through its cross-chunk column halos."""
    import jax
    from stereomatch_tpu.ops import cvf as cvf_mod
    from stereomatch_tpu.ops.cvf_pallas import (
        guided_filter_wedge_chunked_pallas, guided_filter_wedge_pallas)
    D, left, right, vol, _, _ = fixtures

    pre = np.asarray(guided_filter_wedge_pallas(
        vol, left, radius=4, volume_ring=False, raw_volume=False))
    raw = np.asarray(guided_filter_wedge_pallas(
        vol, left, radius=4, volume_ring=False, raw_volume=True))
    np.testing.assert_array_equal(raw, pre)

    ref = np.asarray(jax.jit(lambda v, g: cvf_mod._filter_body_wedge(
        v, g, 4, 1e-4, 0))(vol, left))
    wc = max(8 * (vol.shape[1] // 24), 16)       # force several chunks
    got = np.asarray(guided_filter_wedge_chunked_pallas(
        vol, left, radius=4, chunk_width=wc))
    assert np.array_equal(np.isinf(got), np.isinf(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-5)
