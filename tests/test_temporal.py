"""Temporal video tracking (stereomatch_tpu/temporal.py).

Beyond the reference's capability surface (its video loop re-runs the
full pipeline every frame, stereomatch/cli_video.py:77-124); assertions
anchor against the synthetic temporally coherent sequence generator's
exact per-frame ground truth.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereomatch_tpu.io.synthetic import stereo_sequence
from stereomatch_tpu.temporal import TemporalPipeline


def _bad(disp, gt, tol=1):
    return float((np.abs(np.asarray(disp).astype(np.int64)
                         - np.asarray(gt).astype(np.int64)) > tol).mean())


def test_sequence_generator_is_exact_flat_warp():
    frames = stereo_sequence(32, 48, 8, 4, seed=5)
    assert len(frames) == 4
    xs = np.arange(48)[None, :]
    for left, right, gt in frames:
        np.testing.assert_allclose(
            left, np.take_along_axis(right, xs - gt, axis=1))
    # the scene actually moves between frames
    assert np.any(frames[0][2] != frames[3][2])


def test_tracking_holds_on_coherent_sequence():
    """Drift-only mode: one initial keyframe, every later frame tracked,
    accuracy stays near the keyframe's on gentle motion."""
    frames = stereo_sequence(64, 96, 16, 6, seed=3, motion=1)
    pipe = TemporalPipeline(16, keyframe_interval=0)
    bads = [_bad(pipe.estimate(l, r), gt) for l, r, gt in frames]
    assert pipe.keyframes == 1
    assert pipe.drift_keyframes == 0
    assert max(bads) < 0.08


def test_keyframe_cadence():
    frames = stereo_sequence(48, 64, 16, 5, seed=4, motion=0)
    pipe = TemporalPipeline(16, keyframe_interval=2, drift_threshold=1.0)
    for l, r, _ in frames:
        pipe.estimate(l, r)
    assert pipe.keyframes == 3          # frames 0, 2, 4
    assert pipe.drift_keyframes == 0


def test_drift_triggers_keyframe():
    """A reversed pair (left/right swapped: every true disparity negative)
    has no plausible match anywhere in the band, so the poor-winner
    fraction jumps and the frame must fall back to a keyframe."""
    frames = stereo_sequence(64, 96, 32, 2, seed=3, motion=1)
    pipe = TemporalPipeline(32, keyframe_interval=0)
    for l, r, _ in frames:
        pipe.estimate(l, r)
    assert pipe.keyframes == 1
    l, r, _ = frames[-1]
    pipe.estimate(r, l)                 # garbage frame
    assert pipe.drift_keyframes == 1
    assert pipe.keyframes == 2


def test_recovers_after_drift_keyframe():
    """After the drift keyframe, tracking resumes on the new content and
    accuracy returns to keyframe level."""
    a = stereo_sequence(64, 96, 32, 3, seed=3, motion=1)
    pipe = TemporalPipeline(32, keyframe_interval=0)
    for l, r, _ in a:
        pipe.estimate(l, r)
    l, r, _ = a[-1]
    pipe.estimate(r, l)                 # lose the track
    b = stereo_sequence(64, 96, 32, 3, seed=21, motion=1)
    bads = [_bad(pipe.estimate(l, r), gt) for l, r, gt in b]
    assert bads[-1] < 0.10
    assert pipe.keyframes >= 2


def test_geometry_change_forces_keyframe():
    a = stereo_sequence(48, 64, 16, 2, seed=4)
    pipe = TemporalPipeline(16, keyframe_interval=0)
    for l, r, _ in a:
        pipe.estimate(l, r)
    k = pipe.keyframes
    l, r, _ = stereo_sequence(32, 48, 16, 1, seed=4)[0]
    pipe.estimate(l, r)
    assert pipe.keyframes == k + 1


def test_reset_restarts_with_keyframe():
    frames = stereo_sequence(48, 64, 16, 2, seed=4)
    pipe = TemporalPipeline(16, keyframe_interval=0)
    for l, r, _ in frames:
        pipe.estimate(l, r)
    assert pipe.keyframes == 1
    pipe.reset()
    assert pipe._prev is None and pipe._frame_index == 0
    l, r, _ = frames[0]
    pipe.estimate(l, r)
    assert pipe.keyframes == 1          # counters reset too


def test_tracked_matches_band_refine_plus_median():
    """A tracked frame is exactly band_refine_census + 3x3 median around
    the previous frame's disparity."""
    from stereomatch_tpu.ops.refine import median_filter_3x3
    from stereomatch_tpu.pyramid import band_refine_census

    frames = stereo_sequence(48, 64, 16, 2, seed=6, motion=1)
    pipe = TemporalPipeline(16, keyframe_interval=0)
    (l0, r0, _), (l1, r1, _) = frames
    prev = pipe.estimate(l0, r0)
    got = pipe.estimate(l1, r1)
    want = median_filter_3x3(band_refine_census(
        jnp.asarray(l1, jnp.float32), jnp.asarray(r1, jnp.float32), prev,
        band_radius=pipe.band_radius, max_disparity=16))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_validates_arguments():
    with pytest.raises(ValueError):
        TemporalPipeline(16, band_radius=0)
    with pytest.raises(ValueError):
        TemporalPipeline(16, drift_threshold=0.0)


def test_mesh_tracking_matches_single_chip():
    """The row-sharded tracker (parallel/temporal_sharded.py) bit-matches
    the single-chip TemporalPipeline per stream, with the same keyframe
    schedule (the drift statistic psums to the identical fraction)."""
    import jax
    from stereomatch_tpu.parallel import make_mesh
    assert len(jax.devices()) >= 8
    D = 16
    mesh = make_mesh(jax.devices()[:8], n_batch=2)
    single = TemporalPipeline(D, keyframe_interval=3, backend="xla")
    meshed = TemporalPipeline(D, keyframe_interval=3, backend="xla",
                              mesh=mesh)
    for left, right, _ in stereo_sequence(32, 48, D, 5, seed=3):
        ref = np.asarray(single.estimate(left, right))
        out = np.asarray(meshed.estimate(np.stack([left] * 2),
                                         np.stack([right] * 2)))
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[0], ref)
    assert meshed.keyframes == single.keyframes
    assert meshed.drift_keyframes == single.drift_keyframes


def test_mesh_drift_triggers_keyframe_any_stream():
    """Losing the track in ONE stream forces the shared keyframe (the
    max over per-stream poor fractions crosses the threshold), even
    while the other stream stays coherent."""
    import jax
    from stereomatch_tpu.parallel import make_mesh
    assert len(jax.devices()) >= 8
    D = 32
    mesh = make_mesh(jax.devices()[:8], n_batch=2)
    pipe = TemporalPipeline(D, keyframe_interval=0, backend="xla",
                            mesh=mesh)
    frames = stereo_sequence(64, 96, D, 2, seed=3, motion=1)
    for l, r, _ in frames:
        pipe.estimate(np.stack([l] * 2), np.stack([r] * 2))
    assert pipe.drift_keyframes == 0
    # stream 0 continues; stream 1 sees a reversed pair (all-negative
    # true disparities: no plausible match anywhere in the band).
    l, r, _ = frames[-1]
    pipe.estimate(np.stack([l, r]), np.stack([r, l]))
    assert pipe.drift_keyframes == 1


def test_mesh_mode_validates_stacks():
    import jax
    import pytest as _pytest
    from stereomatch_tpu.parallel import make_mesh
    mesh = make_mesh(jax.devices()[:8], n_batch=2)
    pipe = TemporalPipeline(16, mesh=mesh, backend="xla")
    with _pytest.raises(ValueError):
        pipe.estimate(np.zeros((32, 48)), np.zeros((32, 48)))
