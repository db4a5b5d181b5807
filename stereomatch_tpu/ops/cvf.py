"""Guided-filter cost-volume aggregation (functional, jittable).

A second aggregation family alongside SGM: edge-aware *local* smoothing
of the cost volume by guided image filtering (He et al. 2010), applied
per disparity slice with the left image as the guide — the "cost volume
filtering" method of Hosni et al. (PAMI 2013).  This has no analogue in
the reference (its only aggregation is semiglobal,
stereomatch/aggregation.py:12-57); it is beyond-parity capability.

Why it earns its place on TPU: the whole method is box filters and
elementwise algebra over the [H, W, D] volume — no sequential scans at
all, so unlike SGM it has no recurrence to serialize, trivially
vectorizes over the disparity lane axis, and shards over image tiles
with plain halos (no carry hand-off, no direction families).  It is the
low-latency quality/speed point between raw WTA and full SGM.

Semantics:

* Windows are symmetric ``(2r+1) x (2r+1)`` boxes, clipped at the image
  border, every mean normalized by the count actually inside (the
  published guided-filter convention; note this differs from the SSD
  cost window, which mirrors the reference's half-open ``[i-k, i+k)``).
* Non-finite cost entries (the ``+inf`` fill of the ``d > column``
  wedge, ssd.cu:58-60) are excluded from every window statistic via a
  validity mask and restored as ``+inf`` in the output, so downstream
  WTA/DP see the same invalid-disparity contract as with SGM.  On an
  all-finite volume the masked form reduces exactly to the standard
  guided filter (``assume_finite=True`` skips the mask work — correct
  for census/Birchfield volumes, which have no infinite entries).
* Storage dtype is preserved: bfloat16 volumes stream in/out as bf16
  while all statistics are computed in float32 (the repo-wide
  widen-on-load discipline).
* ``subsample=s`` > 1 switches to the Fast Guided Filter (He & Sun
  2015): all window statistics are computed on an s x-downsampled grid
  (bilinear ``jax.image.resize`` both ways — einsum-based on TPU, no
  gathers) and the per-window linear model is bilinearly upsampled
  before the final ``q = a*I + b``.  The box-filter arithmetic — the
  dominant VPU cost at full resolution, ~2*(2r+1) adds per element per
  statistic — shrinks by s^2 while edges stay sharp because the model
  is still applied against the FULL-resolution guide.  Approximate by
  construction (published quality is near-indistinguishable for
  s <= r/2); ``subsample=1`` is the exact path, bit-identical to the
  default.  Single-chip/streaming only: the partitioners run the exact
  filter (low-res grid alignment does not tile bit-exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _box_sum_sym(x: jnp.ndarray, radius: int, axes=(0, 1)) -> jnp.ndarray:
    """Separable clipped box sum over a symmetric (2r+1) window.

    Out-of-image taps contribute zero (additive identity), which is the
    window-clipping semantic once sums are normalized by the in-image
    tap count.  The leading axis of float arrays rides the MXU as a
    banded contraction where it is short enough (ops/cost.py:
    mxu_leading_box — same measured win as the SSD box pass).
    """
    from .cost import mxu_leading_box, mxu_leading_box_ok

    for ax in axes:
        if (ax == 0 and x.ndim >= 2
                and mxu_leading_box_ok(x.shape[0], x.dtype)):
            x = mxu_leading_box(x, radius, radius)
            continue
        window = [1] * x.ndim
        padding = [(0, 0)] * x.ndim
        window[ax] = 2 * radius + 1
        padding[ax] = (radius, radius)
        x = lax.reduce_window(x, jnp.zeros((), x.dtype), lax.add,
                              window_dimensions=tuple(window),
                              window_strides=(1,) * x.ndim,
                              padding=tuple(padding))
    return x


def _linear_model(mean_p, mean_i, corr_ip, corr_ii, eps):
    """Per-window linear model from windowed means: q ~= a*I + b."""
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + jnp.float32(eps))
    b = mean_p - a * mean_i
    return a, b


def _filter_stats(p32, i32, radius, eps, assume_finite):
    """First guided-filter stage: per-window linear model (a, b).

    Every volume-shaped statistic gets its OWN box call.  Rounds 1-2
    stacked them on the D axis to "save materializations" (the old ZNCC
    idiom), but the round-3 SSD lesson measured the opposite: XLA fuses
    each elementwise producer (``guide * p0`` etc.) straight INTO its
    ``reduce_window``, while a ``concatenate`` materializes every
    operand first — separate calls are bit-identical (windows span only
    (H, W); lanes independent) and moved the teddy cvf stage from 7.57
    to 5.03 ms (benchmarks/cvf_ab_r3_out.json).

    Returns (a, b, finite, box, count): ``finite`` is the validity mask
    (None when assume_finite); ``count`` is the normalizer the second
    stage reuses (stage 2's window-count statistic is the same
    ``box(valid)`` — no recompute).
    """
    box = functools.partial(_box_sum_sym, radius=radius)
    guide = i32[:, :, None]

    if assume_finite:
        finite = None
        ones = jnp.ones(p32.shape[:2], jnp.float32)
        count = box(ones)[:, :, None]                      # [H, W, 1]
        mean_p = box(p32) / count
        corr_ip = box(guide * p32) / count
        # Guide-only stats are [H, W] — negligible beside the volume.
        mean_i = (box(i32) / count[:, :, 0])[:, :, None]
        corr_ii = (box(i32 * i32) / count[:, :, 0])[:, :, None]
    else:
        finite = jnp.isfinite(p32)
        valid = finite.astype(jnp.float32)                 # [H, W, D]
        p0 = jnp.where(finite, p32, 0.0)
        count = jnp.maximum(box(valid), 1.0)               # guard 0/0 —
        # zero-valid windows exist only deep inside the invalid wedge,
        # whose cells are restored to +inf by the caller anyway.
        mean_p = box(p0) / count
        mean_i = box(guide * valid) / count
        corr_ip = box(guide * p0) / count
        corr_ii = box(guide * guide * valid) / count

    a, b = _linear_model(mean_p, mean_i, corr_ip, corr_ii, eps)
    return a, b, finite, box, count


def _resize2d(x, height, width):
    """Bilinear resize over the two leading (spatial) axes."""
    return jax.image.resize(x, (height, width) + x.shape[2:], "bilinear")


def _filter_body_fast(volume, guide, radius, eps, assume_finite,
                      subsample):
    """Fast Guided Filter: statistics on an s x-downsampled grid.

    The masked form downsamples the zeroed volume and the validity mask
    with the SAME bilinear kernel, so their ratio is a kernel-weighted
    masked mean; low-res windows whose pooled validity underflows are
    guarded exactly like empty windows in the exact path.  The +inf
    invalid cells are restored from the FULL-resolution mask.
    """
    s = subsample
    height, width = guide.shape
    lh, lw = max(1, height // s), max(1, width // s)
    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    low_r = max(1, radius // s)

    i_low = _resize2d(i32, lh, lw)
    if assume_finite:
        p_low = _resize2d(p32, lh, lw)
        finite = None
        a, b, _, box, count = _filter_stats(p_low, i_low, low_r, eps, True)
        a_bar = box(a) / count
        b_bar = box(b) / count
    else:
        finite = jnp.isfinite(p32)
        valid = finite.astype(jnp.float32)
        p0 = jnp.where(finite, p32, 0.0)
        # One resize for both pooled quantities (lanes independent), then
        # the masked stats treat the pooled validity as fractional
        # counts: the zeroed volume already carries the weight, and
        # near-zero pooled validity is guarded like empty windows in the
        # exact path (1e-6 floor: pooled counts are fractional).
        ndisp = p32.shape[2]
        low = _resize2d(jnp.concatenate([p0, valid], axis=2), lh, lw)
        p_low, v_low = low[:, :, :ndisp], low[:, :, ndisp:]
        box = functools.partial(_box_sum_sym, radius=low_r)
        g_low = i_low[:, :, None]
        count = jnp.maximum(box(v_low), jnp.float32(1e-6))
        a, b = _linear_model(box(p_low) / count,
                             box(g_low * v_low) / count,
                             box(g_low * p_low) / count,
                             box(g_low * g_low * v_low) / count, eps)
        a_bar = box(a * v_low) / count
        b_bar = box(b * v_low) / count

    a_full = _resize2d(a_bar, height, width)
    b_full = _resize2d(b_bar, height, width)
    q = a_full * i32[:, :, None] + b_full
    if finite is not None:
        q = jnp.where(finite, q, jnp.float32(jnp.inf))
    return q.astype(volume.dtype)


def _filter_body(volume, guide, radius, eps, assume_finite, subsample=1):
    # Trace-time checks shared by both entry points (the CLIs take bare
    # int/float flags; fail with a clear message, not a reduce_window
    # shape error or an inf/NaN division at runtime).
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    if not eps > 0:
        raise ValueError(f"eps must be > 0, got {eps} (zero divides by "
                         "the variance of constant-guide windows)")
    if subsample < 1:
        raise ValueError(f"subsample must be >= 1, got {subsample}")
    if subsample > 1:
        return _filter_body_fast(volume, guide, radius, eps,
                                 assume_finite, subsample)
    p32 = volume.astype(jnp.float32)
    i32 = guide.astype(jnp.float32)
    a, b, finite, box, count = _filter_stats(p32, i32, radius, eps,
                                             assume_finite)

    # Second stage: each output pixel averages the linear models of every
    # window that contains it.  Under masking only windows centered at a
    # valid cell contribute (their (a, b) describe real data); on finite
    # volumes this is the plain box mean of the standard algorithm.
    # ``count`` from stage 1 IS stage 2's normalizer (same box(valid)).
    if finite is None:
        q = (box(a) / count) * i32[:, :, None] + box(b) / count
    else:
        valid = finite.astype(jnp.float32)
        q = ((box(a * valid) / count) * i32[:, :, None]
             + box(b * valid) / count)
        q = jnp.where(finite, q, jnp.float32(jnp.inf))
    return q.astype(volume.dtype)


@functools.partial(jax.jit,
                   static_argnames=("radius", "eps", "assume_finite",
                                    "subsample"))
def guided_filter_aggregate(cost_volume: jnp.ndarray, guide: jnp.ndarray,
                            *, radius: int = 8, eps: float = 1e-4,
                            assume_finite: bool = False,
                            subsample: int = 1) -> jnp.ndarray:
    """Edge-aware local aggregation: guided-filter each disparity slice.

    Args:
        cost_volume: [H, W, D] matching costs (float32/bfloat16; +inf
          marks invalid disparities and survives the filter).
        guide: [H, W] left image (the edge structure the smoothing
          respects — disparity boundaries in stereo follow image edges).
        radius: window half-size; the smoothing support is
          (2*radius+1)^2 (second stage doubles the effective reach).
        eps: edge-stop regularizer — larger blurs across weaker edges
          (the guided-filter epsilon; scale is image-intensity^2, so
          1e-4 suits [0, 1]-normalized images).
        assume_finite: skip the validity-mask plumbing (exact only when
          the volume has no non-finite entries, e.g. census/Birchfield).
        subsample: > 1 enables the Fast Guided Filter — window
          statistics on an s x-downsampled grid (box arithmetic shrinks
          by s^2; the model still applies against the full-res guide).
          Approximate; 1 (default) is the exact filter.
    """
    if cost_volume.ndim != 3:
        raise ValueError(f"cost_volume must be [H, W, D], got "
                         f"{cost_volume.shape}")
    if guide.shape != cost_volume.shape[:2]:
        raise ValueError(f"guide {guide.shape} does not match volume "
                         f"spatial dims {cost_volume.shape[:2]}")
    return _filter_body(cost_volume, guide, int(radius), float(eps),
                        bool(assume_finite), int(subsample))


def guided_filter_from_padded(volume_padded: jnp.ndarray,
                              guide_padded: jnp.ndarray,
                              pad_before: int, pad_after: int,
                              *, radius: int = 8, eps: float = 1e-4,
                              assume_finite: bool = False) -> jnp.ndarray:
    """Row-sharded body: filter a tile carrying halo rows, crop the halo.

    Both filter stages are box means, so the output at row y depends on
    input rows [y - 2*radius, y + 2*radius]; with ``pad_*`` >= 2*radius
    halo rows from the neighboring tiles (zero rows beyond the global
    image edge, where windows clip anyway) the cropped interior is
    bit-identical to the unsharded filter — this is what the sharded
    parity tests assert.  Ragged halos (first/last tile) are fine: the
    caller passes the rows that exist and the clipped-count
    normalization handles the rest, PROVIDED out-of-image pad rows are
    marked invalid.  With ``assume_finite`` there is no mask to mark
    them with, so callers must pass exactly the existing rows
    (pad_before = 0 on the first tile, etc.), which the halo helpers'
    ring-end zero fill does not guarantee — the sharded layer therefore
    always uses the masked path and poisons out-of-image halo rows to
    +inf instead.
    """
    out = _filter_body(volume_padded, guide_padded, int(radius),
                       float(eps), bool(assume_finite))
    height = out.shape[0] - pad_before - pad_after
    return lax.dynamic_slice_in_dim(out, pad_before, height, axis=0)
