"""Disparity to metric depth and 3-D point clouds.

The reference stops at disparity maps; a depth engine's consumers almost
always want metric output, so this module closes the loop using the
calibration data Middlebury scenes already ship (calib.txt ``cam0``,
``baseline``, ``doffs`` fields — the same file whose ``ndisp`` the
evaluation workflow reads, reference workflows/evaluation/workflow.py:57).

The conversions are jitted element-wise maps (they fuse into whatever
pipeline produced the disparity); the PLY writer is host-side I/O.

Conventions (Middlebury v3 calibration docs):
    Z = baseline * focal / (disparity + doffs)
with ``doffs`` the difference of principal-point x-offsets between the two
cameras.  Pixels with non-positive or non-finite disparity (fill values,
unmatched regions) are invalid and map to depth 0 / masked-out points.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraIntrinsics:
    """Pinhole intrinsics of the rectified left camera plus stereo geometry.

    Attributes:
        focal: focal length in pixels (fx == fy after rectification).
        cx, cy: principal point in pixels.
        baseline: stereo baseline (any length unit; depth comes out in it).
        doffs: x-principal-point difference cx1 - cx0 added to disparities.
    """

    def __init__(self, focal: float, cx: float, cy: float,
                 baseline: float, doffs: float = 0.0):
        self.focal = float(focal)
        self.cx = float(cx)
        self.cy = float(cy)
        self.baseline = float(baseline)
        self.doffs = float(doffs)

    @classmethod
    def from_middlebury_calib(cls, path) -> "CameraIntrinsics":
        """Read cam0/baseline/doffs from a Middlebury calib.txt.

        The matrix line looks like ``cam0=[f 0 cx; 0 f cy; 0 0 1]``.
        """
        props: Dict[str, str] = {}
        with open(path, "r", encoding="ascii") as f:
            for line in f:
                if "=" in line:
                    name, value = line.split("=", 1)
                    props[name.strip()] = value.strip()
        if "cam0" not in props:
            raise ValueError(f"{path}: no cam0 matrix in calib file")
        nums = [float(v) for v in re.findall(r"[-+0-9.eE]+", props["cam0"])]
        if len(nums) != 9:
            raise ValueError(f"{path}: cam0 is not a 3x3 matrix: "
                             f"{props['cam0']!r}")
        focal, cx, cy = nums[0], nums[2], nums[5]
        return cls(focal=focal, cx=cx, cy=cy,
                   baseline=float(props.get("baseline", 1.0)),
                   doffs=float(props.get("doffs", 0.0)))

    def __repr__(self) -> str:
        return (f"CameraIntrinsics(focal={self.focal}, cx={self.cx}, "
                f"cy={self.cy}, baseline={self.baseline}, "
                f"doffs={self.doffs})")


@jax.jit
def _depth_map(disparity, focal, baseline, doffs):
    raw = disparity.astype(jnp.float32)
    disp = raw + doffs
    # Raw disparity must itself be positive: 0 is the Middlebury unknown
    # marker (and WTA's left-edge fill), which a positive doffs would
    # otherwise turn into a plausible-looking far depth.
    valid = jnp.isfinite(raw) & (raw > 0) & (disp > 0)
    return jnp.where(valid, focal * baseline / jnp.maximum(disp, 1e-12), 0.0)


def depth_from_disparity(disparity: jnp.ndarray,
                         intrinsics: CameraIntrinsics) -> jnp.ndarray:
    """[H, W] metric depth (baseline units); invalid disparities -> 0.

    Accepts integer (WTA/DP output) or float (sub-pixel refined)
    disparities.
    """
    return _depth_map(jnp.asarray(disparity), jnp.float32(intrinsics.focal),
                      jnp.float32(intrinsics.baseline),
                      jnp.float32(intrinsics.doffs))


@jax.jit
def _reproject(disparity, focal, cx, cy, baseline, doffs):
    depth = _depth_map(disparity, focal, baseline, doffs)
    shape = disparity.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    x3 = (xs - cx) * depth / focal
    y3 = (ys - cy) * depth / focal
    return jnp.stack([x3, y3, depth], axis=-1)


def reproject_disparity(disparity: jnp.ndarray,
                        intrinsics: CameraIntrinsics) -> jnp.ndarray:
    """[H, W, 3] camera-frame points (x right, y down, z forward).

    Invalid pixels (disparity <= 0 after doffs, or non-finite) come back
    as the origin with z == 0 — filter with ``points[..., 2] > 0`` or pass
    the map through :func:`write_ply`, which drops them.
    """
    return _reproject(jnp.asarray(disparity),
                      jnp.float32(intrinsics.focal),
                      jnp.float32(intrinsics.cx), jnp.float32(intrinsics.cy),
                      jnp.float32(intrinsics.baseline),
                      jnp.float32(intrinsics.doffs))


def write_ply(path, points: np.ndarray,
              colors: Optional[np.ndarray] = None,
              mask: Optional[np.ndarray] = None,
              max_depth: Optional[float] = None) -> int:
    """Write a binary little-endian PLY point cloud; returns point count.

    Args:
        path: output file.
        points: [..., 3] float array (from :func:`reproject_disparity`).
        colors: optional [..., 3] uint8 or [...] grayscale array matching
            the leading shape of ``points``.
        mask: optional boolean keep-mask over the leading shape; combined
            with the built-in validity filter (z > 0, finite).
        max_depth: optional far-plane cut (drops sky/occlusion fill
            blow-ups near disparity 0).
    """
    points = np.asarray(points, np.float32)
    lead_shape = points.shape[:-1]
    pts = points.reshape(-1, 3)
    keep = np.isfinite(pts).all(axis=1) & (pts[:, 2] > 0)
    if max_depth is not None:
        keep &= pts[:, 2] <= max_depth
    if mask is not None:
        keep &= np.asarray(mask, bool).reshape(-1)
    pts = pts[keep]

    rgb = None
    if colors is not None:
        rgb = np.asarray(colors)
        if rgb.shape == lead_shape:                       # grayscale
            rgb = np.repeat(rgb.reshape(-1, 1), 3, axis=1)
        elif rgb.shape == lead_shape + (3,):
            rgb = rgb.reshape(-1, 3)
        else:
            raise ValueError(f"colors shape {rgb.shape} does not match "
                             f"points {lead_shape}")
        if rgb.dtype != np.uint8:
            scale = 255.0 if float(rgb.max(initial=0.0)) <= 1.0 else 1.0
            rgb = np.clip(rgb * scale, 0, 255).astype(np.uint8)
        rgb = rgb[keep]

    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if rgb is not None:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    rec = np.empty(pts.shape[0], dtype=fields)
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    if rgb is not None:
        rec["red"], rec["green"], rec["blue"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {pts.shape[0]}",
              "property float x", "property float y", "property float z"]
    if rgb is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())
    return int(pts.shape[0])


def read_ply(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read back a PLY written by :func:`write_ply` (round-trip testing)."""
    with open(path, "rb") as f:
        lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            lines.append(line)
            if line == "end_header":
                break
        n = int(next(l for l in lines if l.startswith("element vertex"))
                .split()[-1])
        has_rgb = any(l == "property uchar red" for l in lines)
        fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if has_rgb:
            fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        rec = np.frombuffer(f.read(), dtype=fields, count=n)
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
    rgb = (np.stack([rec["red"], rec["green"], rec["blue"]], axis=1)
           if has_rgb else None)
    return pts, rgb
