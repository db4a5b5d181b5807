"""Test configuration.

Tests run on the XLA:CPU backend with 8 virtual devices so that sharding
tests exercise a real mesh without TPU hardware, mirroring how the driver
validates the multi-chip path.  The env vars must be set before jax
initializes its backends, hence the top-of-file placement.
"""

import os

# STM_TEST_ON_TPU=1 leaves the accelerator backend selected so
# tests/test_tpu_hardware.py can compile the real Mosaic kernels;
# everything else runs on the virtual CPU mesh.
_ON_TPU = bool(os.environ.get("STM_TEST_ON_TPU"))

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    # Site customization (e.g. a TPU PJRT plugin registered from
    # sitecustomize) may have force-selected another platform before this
    # file ran; the config update wins over both.
    jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402
import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The reference pins these in pytest_configure (tests/conftest.py:81-86).
STM_MAX_DISPARITY = 16
TEST_OUTPUT_PATH = Path(__file__).parent / "test-result"


def _smooth_texture(rng, height: int, width: int) -> np.ndarray:
    """Smooth but feature-rich random texture in [0, 1]."""
    noise = rng.standard_normal((height, width)).astype(np.float32)
    texture = noise.copy()
    for _ in range(3):
        texture = (texture
                   + np.roll(texture, 1, 0) + np.roll(texture, -1, 0)
                   + np.roll(texture, 1, 1) + np.roll(texture, -1, 1)) / 5.0
    texture += 0.15 * noise  # keep high-frequency detail for matching
    texture -= texture.min()
    texture /= max(texture.max(), 1e-6)
    return texture


def synthetic_stereo_pair_occluded(height: int, width: int,
                                   max_disparity: int, seed: int = 7,
                                   n_boxes: int = 3):
    """Occlusion-aware synthetic scene: layered right-view compositing.

    Unlike :func:`synthetic_stereo_pair` (which warps one flat texture, so
    every left pixel has a perfect right match), this scene models two
    depth layers physically: textured foreground boxes composited over a
    wider background strip in the RIGHT view, and a LEFT view assembled
    per layer.  Left background pixels whose right-view correspondence is
    covered by a nearer box have *no* matching right content — true
    occlusions, with an exact mask.

    Returns (left, right, gt_disparity, occluded) — occluded[y, x] True
    where the left pixel is invisible to the right camera (matching there
    is unsolvable; evaluate bad-pixel on ~occluded, and use the mask as
    ground truth for left-right-consistency tests).
    """
    rng = np.random.default_rng(seed)
    d_bg = max(max_disparity // 8, 1)
    strip = _smooth_texture(rng, height, width + max_disparity)

    # RIGHT view: background + boxes painted nearest-last.
    right = strip[:, max_disparity:].copy()
    d_right = np.full((height, width), d_bg, np.int32)
    boxes = []
    for _ in range(n_boxes):
        r0 = int(rng.integers(0, max(height - 8, 1)))
        c0 = int(rng.integers(0, max(width - 8, 1)))
        bh = int(rng.integers(height // 6 + 1, height // 2 + 2))
        bw = int(rng.integers(width // 6 + 1, width // 2 + 2))
        bh, bw = min(bh, height - r0), min(bw, width - c0)
        d_f = int(rng.integers(d_bg + 1, max_disparity - 1))
        boxes.append((d_f, r0, c0, bh, bw,
                      _smooth_texture(rng, bh, bw)))
    boxes.sort(key=lambda b: b[0])          # nearest (largest d) last
    for d_f, r0, c0, bh, bw, tex in boxes:
        right[r0:r0 + bh, c0:c0 + bw] = tex
        d_right[r0:r0 + bh, c0:c0 + bw] = d_f

    # LEFT view: background first (sampling the strip, which extends past
    # the right image's left edge), then boxes shifted right by their
    # disparity, nearest last.
    xs = np.arange(width)[None, :]
    left = np.take_along_axis(
        strip, np.clip(xs - d_bg + max_disparity, 0, None)
        * np.ones((height, 1), np.int32), axis=1).astype(np.float32)
    gt = np.full((height, width), d_bg, np.int32)
    for d_f, r0, c0, bh, bw, tex in boxes:
        l0 = c0 + d_f
        l1 = min(l0 + bw, width)
        if l1 <= l0:
            continue
        left[r0:r0 + bh, l0:l1] = tex[:, :l1 - l0]
        gt[r0:r0 + bh, l0:l1] = d_f

    # Occlusions: the left pixel's right-view point is covered by a nearer
    # surface (or falls off the image).
    xr = xs - gt
    occluded = xr < 0
    xr_safe = np.clip(xr, 0, width - 1)
    occluded = occluded | (np.take_along_axis(
        d_right, xr_safe * np.ones((height, 1), np.int32), axis=1) > gt)
    gt = np.minimum(gt, np.maximum(xs, 0)).astype(np.int32)
    return (left.astype(np.float32), right.astype(np.float32), gt,
            occluded)


def synthetic_stereo_pair(height: int, width: int, max_disparity: int,
                          seed: int = 7):
    """Procedural rectified stereo pair with exact ground-truth disparity.

    The reference test suite uses the Middlebury 2003 *teddy* pair
    (tests/conftest.py:15-31), which cannot be fetched offline; this scene —
    a smooth random texture with disparity-shifted layered boxes — plays the
    same role and additionally provides exact ground truth for bad-pixel
    metrics (the reference has none checked in).

    Returns (left, right, gt_disparity) float32/float32/int32, with
    left[y, x] = right[y, x - gt[y, x]].
    """
    rng = np.random.default_rng(seed)

    # Smooth but feature-rich texture for the right image.
    noise = rng.standard_normal((height, width + max_disparity)).astype(np.float32)
    texture = noise.copy()
    for _ in range(3):
        texture = (texture
                   + np.roll(texture, 1, 0) + np.roll(texture, -1, 0)
                   + np.roll(texture, 1, 1) + np.roll(texture, -1, 1)) / 5.0
    texture += 0.15 * noise  # keep high-frequency detail for matching
    texture -= texture.min()
    texture /= max(texture.max(), 1e-6)

    # Layered ground-truth disparity: background plane + boxes.
    gt = np.full((height, width), max(max_disparity // 8, 1), np.int32)
    n_boxes = 4
    for i in range(n_boxes):
        h0 = int(rng.integers(0, max(height - 8, 1)))
        w0 = int(rng.integers(0, max(width - 8, 1)))
        bh = int(rng.integers(height // 6 + 1, height // 2 + 2))
        bw = int(rng.integers(width // 6 + 1, width // 2 + 2))
        d = int(rng.integers(1, max_disparity - 1))
        gt[h0:h0 + bh, w0:w0 + bw] = d

    # Guarantee d <= x validity near the left edge.
    xs = np.arange(width)[None, :]
    gt = np.minimum(gt, np.maximum(xs, 0)).astype(np.int32)

    right = texture[:, max_disparity:].astype(np.float32)
    xr = xs - gt
    left = np.take_along_axis(texture[:, max_disparity:], xr, axis=1)
    return left.astype(np.float32), right.astype(np.float32), gt


@dataclasses.dataclass
class CostFixture:
    """Mirrors the reference's CostFixture (tests/conftest.py:34-50)."""
    volume: np.ndarray
    left_image: np.ndarray


@pytest.fixture(scope="session")
def stereo_pair_small():
    """Small pair for exact oracle comparisons (oracles are O(HWDk^2))."""
    left, right, gt = synthetic_stereo_pair(21, 33, STM_MAX_DISPARITY)
    return left, right


@pytest.fixture(scope="session")
def stereo_pair_medium():
    """Teddy-shaped (scaled-down) pair for integration/metric tests."""
    return synthetic_stereo_pair(64, 128, STM_MAX_DISPARITY)


@pytest.fixture(scope="session")
def ssd_cost_small(stereo_pair_small):
    """SSD cost volume fixture for aggregation/reduce tests, like the
    reference's ssd_cost fixture (tests/conftest.py:53-78)."""
    from stereomatch_tpu.ops.cost import ssd_cost_volume
    left, right = stereo_pair_small
    vol = np.asarray(ssd_cost_volume(left, right,
                                     max_disparity=STM_MAX_DISPARITY))
    return CostFixture(volume=vol, left_image=left)


def pytest_configure():
    pytest.STM_TEST_OUTPUT_PATH = TEST_OUTPUT_PATH
    pytest.STM_MAX_DISPARITY = STM_MAX_DISPARITY
    TEST_OUTPUT_PATH.mkdir(exist_ok=True, parents=True)
