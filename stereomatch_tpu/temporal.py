"""Temporal disparity tracking for stereo video: per-frame census band
refinement anchored on the previous frame's disparity, with keyframes on
a fixed cadence and whenever the anchor demonstrably drifts.

Beyond the reference's capability surface: its video loop
(stereomatch/cli_video.py:77-124) runs the full [H, W, D] pipeline on
every frame.  Video disparity is temporally coherent — between frames
almost every pixel moves by far less than the search range — so the
steady-state work can be a [H, W, 2r+1] band score around frame t-1's
disparity (the same band stage the coarse-to-fine pyramid uses spatially,
see :mod:`stereomatch_tpu.pyramid`): no cost volume, no aggregation, two
census transforms, one gather + popcount.  D/(2r+1) times less volume
work per tracked frame (128/13 ≈ 10x at teddy scale).

Tracking needs a failure signal, and census gives one for free: the
winning Hamming distance.  A well-anchored pixel on plausibly matching
content wins with a small distance; when the anchor is stale (scene cut,
fast motion beyond the band) the best candidate in the band is no better
than random bit agreement.  ``TemporalPipeline`` keyframes when the
fraction of poor winners exceeds ``drift_threshold`` — a scene cut makes
that fraction jump an order of magnitude (tests/test_temporal.py) — or
every ``keyframe_interval`` frames as a hard bound on error accumulation.

The drift statistic costs no extra device *compute* (it is a reduction
over the band scores the tracker already produced), and its host read is
overlapped with the disparity transfer the caller performs anyway
(``copy_to_host_async`` on both results), so a tracked frame pays one
transport window, not two.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.refine import median_filter_3x3
from .pyramid import band_refine_census
from .utils import validation


class TemporalPipeline:
    """Stateful video estimator: keyframe pipeline + band tracking.

    ``estimate(left, right)`` matches :class:`~stereomatch_tpu.pipeline.
    Pipeline`'s surface but carries state between calls: the first frame
    (and every ``keyframe_interval``-th, and any frame whose band drift
    statistic exceeds ``drift_threshold``) runs the full ``keyframe``
    pipeline; every other frame re-scores only ``2 * band_radius + 1``
    census candidates around the previous disparity.

    Args:
      max_disparity: full search range (keyframes use all of it; tracked
        frames only validate candidates against it).
      keyframe: any object with ``estimate(left, right) -> [H, W] int32``
        — a :class:`~stereomatch_tpu.pipeline.Pipeline`, a
        :class:`~stereomatch_tpu.pyramid.PyramidPipeline`, or a sharded
        mesh pipeline.  Default: full-resolution census+SGM+WTA.
      band_radius: tracked-frame search half-width; inter-frame disparity
        changes larger than this are only recovered at keyframes.
      keyframe_interval: hard keyframe cadence (0 disables the cadence,
        leaving drift as the only trigger).
      drift_threshold: keyframe when this fraction of pixels wins its
        band with >= ``poor_bits`` disagreeing census neighbours.
      poor_bits: Hamming distance at which a winner counts as poor.
        Default 8 for the 5x5 window: a tracked flat-warp frame measures
        frac(best >= 8) ~ 0.02 while a genuinely lost anchor measures
        0.11-0.33 (the min of 2r+1 random 24-bit Hamming draws
        concentrates near 7-9), so the default threshold 0.06 separates
        the regimes by ~2-3x on either side.  The statistic is blind to
        *plausible* wrong matches (smooth texture off by a few
        disparities scores well), which is what the cadence bounds.
      median: 3x3-median the tracked disparity (same speckle argument as
        the pyramid's inter-level filter).
      mesh: optional (batch, tile) ``jax.sharding.Mesh``.  The tracker
        then spans chips: the batch axis carries independent streams (a
        multi-camera rig — ``estimate`` takes/returns [B, H, W] stacks),
        the tile axis shards image rows
        (parallel/temporal_sharded.py), and the default keyframe becomes
        the equivalent :class:`~stereomatch_tpu.parallel.ShardedPipeline`.
        The keyframe schedule is shared across streams: a drift keyframe
        fires when ANY stream's poor fraction exceeds the threshold
        (per-stream schedules would diverge the compiled control flow).
    """

    def __init__(self, max_disparity: int, *,
                 keyframe=None,
                 band_radius: int = 6,
                 window_size: int = 5,
                 keyframe_interval: int = 16,
                 drift_threshold: float = 0.06,
                 poor_bits: Optional[int] = None,
                 median: bool = True,
                 penalty1: float = 0.1, penalty2: float = 0.2,
                 backend: str = "auto",
                 mesh=None):
        if band_radius < 1:
            raise ValueError("band_radius must be >= 1")
        if not 0.0 < drift_threshold <= 1.0:
            raise ValueError("drift_threshold must be in (0, 1]")
        self.max_disparity = max_disparity
        self.band_radius = band_radius
        self.window_size = window_size
        self.keyframe_interval = keyframe_interval
        self.drift_threshold = drift_threshold
        n_neighbour_bits = window_size * window_size - 1
        self.poor_bits = (poor_bits if poor_bits is not None
                          else max(n_neighbour_bits // 3, 1))
        self.median = median
        self.mesh = mesh
        if keyframe is None:
            if mesh is not None:
                from .parallel import ShardedPipeline
                keyframe = ShardedPipeline(
                    mesh, max_disparity, cost="census",
                    aggregation="sgm", reducer="wta",
                    penalty1=penalty1, penalty2=penalty2, backend=backend)
            else:
                from .cli_common import create_pipeline
                keyframe = create_pipeline(
                    "census", "wta", "sgm", max_disparity=max_disparity,
                    penalty1=penalty1, penalty2=penalty2, backend=backend)
        self.keyframe = keyframe
        if mesh is not None:
            from .parallel.temporal_sharded import make_temporal_track_sharded
            self._track_fn = make_temporal_track_sharded(
                mesh, max_disparity=max_disparity, band_radius=band_radius,
                window_size=window_size, poor_bits=self.poor_bits,
                median=median)
        else:
            self._track_fn = jax.jit(self._track)
        self.reset()

    def reset(self) -> None:
        """Drop tracking state; the next frame is a keyframe."""
        self._prev = None
        self._frame_index = 0
        self.keyframes = 0
        self.drift_keyframes = 0

    def _track(self, left, right, prev):
        left = left.astype(jnp.float32)
        right = right.astype(jnp.float32)
        disp, best_cost = band_refine_census(
            left, right, prev, band_radius=self.band_radius,
            max_disparity=self.max_disparity,
            window_size=self.window_size, return_best_cost=True)
        if self.median:
            disp = median_filter_3x3(disp)
        # Poor fraction over pixels that could match at all: x == 0
        # columns have no candidate and would bias the statistic.
        x = jnp.arange(left.shape[1], dtype=jnp.int32)[None, :]
        scorable = jnp.broadcast_to(x > 0, disp.shape)
        poor = (best_cost >= self.poor_bits) & scorable
        poor_frac = poor.sum() / jnp.maximum(scorable.sum(), 1)
        return disp, poor_frac.astype(jnp.float32)

    def estimate(self, left_image, right_image) -> jnp.ndarray:
        left = jnp.asarray(left_image)
        right = jnp.asarray(right_image)
        squeeze = False
        if self.mesh is not None:
            if left.ndim == 2:
                # Single-stream convenience: rows shard over the tile
                # axis; needs a trivial batch axis.
                from .parallel.mesh import BATCH_AXIS
                if self.mesh.shape[BATCH_AXIS] != 1:
                    raise ValueError(
                        "2-D frames in mesh mode need a batch axis of 1 "
                        f"(got {self.mesh.shape[BATCH_AXIS]}); pass "
                        "[B, H, W] stacks to use batch parallelism")
                left, right = left[None], right[None]
                squeeze = True
            if left.ndim != 3 or left.shape != right.shape:
                raise ValueError("mesh mode takes matching [B, H, W] stacks")
        else:
            validation.check_stereo_pair(left, right)

        due = (self._prev is None
               or (self.keyframe_interval > 0
                   and self._frame_index % self.keyframe_interval == 0))
        if not due and self._prev.shape != left.shape:
            due = True                     # geometry changed mid-stream
        if not due:
            disp, poor_frac = self._track_fn(left, right, self._prev)
            # The drift decision needs the scalar on the host, so one
            # device round trip per tracked frame is inherent — but the
            # caller's own disparity fetch must not become a second,
            # serialized one.  Start both host copies now: they share
            # the same transport window, and the caller's np.asarray
            # finds the disparity already (mostly) landed.
            for arr in (disp, poor_frac):
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    break
            if float(np.max(np.asarray(poor_frac))) > self.drift_threshold:
                self.drift_keyframes += 1
                due = True
        if due:
            disp = self.keyframe.estimate(left, right)
            self.keyframes += 1

        self._prev = disp
        self._frame_index += 1
        return disp[0] if squeeze else disp
