"""Disparity quality metrics.

TPU-native replacement for the reference's dependency on
``stereomideval.eval.Metric`` in its Flyte workflow
(workflows/evaluation/workflow.py:96-98): RMSE, average absolute error and
bad-pixel percentage, each masked to valid ground-truth pixels.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def _valid_mask(gt_disparity: jnp.ndarray) -> jnp.ndarray:
    """Valid ground truth: finite and strictly positive (Middlebury PFMs use
    inf/0 for unknown pixels)."""
    gt = gt_disparity.astype(jnp.float32)
    return jnp.logical_and(jnp.isfinite(gt), gt > 0)


@jax.jit
def rmse(predicted: jnp.ndarray, gt_disparity: jnp.ndarray) -> jnp.ndarray:
    mask = _valid_mask(gt_disparity)
    diff = predicted.astype(jnp.float32) - gt_disparity.astype(jnp.float32)
    sq = jnp.where(mask, diff * diff, 0.0)
    return jnp.sqrt(jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1))


@jax.jit
def avg_abs_error(predicted: jnp.ndarray,
                  gt_disparity: jnp.ndarray) -> jnp.ndarray:
    mask = _valid_mask(gt_disparity)
    diff = jnp.abs(predicted.astype(jnp.float32)
                   - gt_disparity.astype(jnp.float32))
    return jnp.sum(jnp.where(mask, diff, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


@functools.partial(jax.jit, static_argnames=("threshold",))
def bad_pixel_ratio(predicted: jnp.ndarray, gt_disparity: jnp.ndarray,
                    threshold: float = 2.0) -> jnp.ndarray:
    """Fraction of valid pixels whose |error| exceeds ``threshold`` (the
    Middlebury "bad2.0"-style metric)."""
    mask = _valid_mask(gt_disparity)
    diff = jnp.abs(predicted.astype(jnp.float32)
                   - gt_disparity.astype(jnp.float32))
    bad = jnp.logical_and(mask, diff > threshold)
    return jnp.sum(bad) / jnp.maximum(jnp.sum(mask), 1)


def evaluate(predicted, gt_disparity, threshold: float = 2.0) -> Dict[str, float]:
    """All metrics as Python floats (workflow.py:96-103 equivalent)."""
    return {
        "rmse": float(rmse(predicted, gt_disparity)),
        "avg_abs_error": float(avg_abs_error(predicted, gt_disparity)),
        "bad_pixel_ratio": float(bad_pixel_ratio(predicted, gt_disparity,
                                                 threshold=threshold)),
    }


def metrics_markdown_table(rows) -> str:
    """Render per-config metric rows as a markdown table, like the
    reference's join_metrics task (workflow.py:108-121).

    Args:
        rows: iterable of dicts with keys name/rmse/avg_abs_error/
          bad_pixel_ratio.
    """
    lines = ["| config | rmse | avg abs err | bad pixel % |",
             "|---|---|---|---|"]
    for row in rows:
        lines.append(
            f"| {row['name']} | {row['rmse']:.4f} | "
            f"{row['avg_abs_error']:.4f} | "
            f"{row['bad_pixel_ratio'] * 100:.2f} |")
    return "\n".join(lines)
