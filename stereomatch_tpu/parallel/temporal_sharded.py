"""Row-sharded temporal tracking step for stereo video.

Mesh counterpart of :class:`stereomatch_tpu.temporal.TemporalPipeline`'s
tracked-frame path (no reference analogue at either level — the
reference's video loop runs the full pipeline every frame).  The batch
mesh axis carries independent streams (a multi-camera rig); the tile
axis shards image rows for latency, exactly as the main pipelines.

Everything the tracker needs is already row-local under row sharding:
the census band scan wants ±window//2 image-row halos
(parallel/pyramid_sharded.py::_band_sharded), the 3x3 median one
disparity row per neighbor, and the drift statistic — the fraction of
pixels whose band winner has a poor Hamming distance — is a pair of
sums ``psum``'d over the tile axis, so every device returns the same
per-stream fraction and the host-side keyframe decision needs no extra
collective round trip.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

import jax

from .mesh import BATCH_AXIS, TILE_AXIS
from .pyramid_sharded import _band_sharded
from .sharded import _median3x3_rows


def make_temporal_track_sharded(mesh, *, max_disparity: int,
                                band_radius: int = 6,
                                window_size: int = 5,
                                poor_bits: int = 8,
                                median: bool = True):
    """Compile the tracked-frame step over a (batch, tile) mesh.

    Returns a jitted ``fn(left, right, prev) -> (disparity, poor_frac)``
    over batched stacks: [B, H, W] x3 -> ([B, H, W] int32, [B] float32),
    with B divisible by the batch axis and H by the tile axis.  Matches
    ``TemporalPipeline._track`` per stream (same band scan, median, and
    poor-winner statistic — tests/test_temporal.py pins the equality).
    """
    n_tiles = mesh.shape[TILE_AXIS]

    def local_fn(left, right, prev):               # [B_loc, Hl, W]
        left = left.astype(jnp.float32)
        right = right.astype(jnp.float32)
        disp, best = _band_sharded(
            left, right, prev, band_radius=band_radius,
            max_disparity=max_disparity, window_size=window_size,
            axis_name=TILE_AXIS, return_best_cost=True)
        if median:
            disp = _median3x3_rows(disp, axis_name=TILE_AXIS,
                                   n_tiles=n_tiles)
        # Poor fraction over pixels that could match at all (x == 0
        # columns have no candidate); both sums span the full image via
        # a tile-axis psum, so the fraction is identical on every tile.
        x = lax.broadcasted_iota(jnp.int32, disp.shape, 2)
        scorable = x > 0
        poor = (best >= poor_bits) & scorable
        sums = jnp.stack([poor.sum(axis=(1, 2)),
                          scorable.sum(axis=(1, 2))]).astype(jnp.float32)
        sums = lax.psum(sums, TILE_AXIS)
        poor_frac = sums[0] / jnp.maximum(sums[1], 1.0)
        return disp, poor_frac

    spec = P(BATCH_AXIS, TILE_AXIS, None)
    mapped = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, P(BATCH_AXIS)))
    sharding = NamedSharding(mesh, spec)
    return jax.jit(mapped, in_shardings=(sharding, sharding, sharding),
                   out_shardings=(sharding, NamedSharding(mesh, P(BATCH_AXIS))))
