"""Visualization helpers for disparity maps.

Equivalent of the reference's test helper ``tests/viz.py:11-29``
(save_depthmap) plus the rainbow colormap used by its video CLI
(cli_video.py:73,101).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def normalize_disparity(disparity: np.ndarray,
                        max_disparity: int = None) -> np.ndarray:
    """Scale a disparity image to [0, 1] float32."""
    disparity = np.asarray(disparity, np.float32)
    if max_disparity is None:
        max_disparity = max(float(disparity.max()), 1.0)
    return np.clip(disparity / float(max_disparity), 0.0, 1.0)


def colorize_disparity(disparity: np.ndarray,
                       max_disparity: int = None,
                       cmap: str = "rainbow") -> np.ndarray:
    """Disparity -> RGB uint8 via a matplotlib colormap."""
    import matplotlib
    norm = normalize_disparity(disparity, max_disparity)
    mapper = matplotlib.colormaps[cmap]
    return (mapper(norm)[:, :, :3] * 255).astype(np.uint8)


def save_depthmap(disparity, path, max_disparity: int = None) -> Path:
    """Save a disparity image as a colorized PNG; returns the path written."""
    from PIL import Image
    path = Path(path)
    if path.suffix.lower() != ".png":
        path = path.with_suffix(".png")
    path.parent.mkdir(parents=True, exist_ok=True)
    rgb = colorize_disparity(np.asarray(disparity), max_disparity)
    Image.fromarray(rgb).save(path)
    return path
