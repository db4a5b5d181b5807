"""Texture/sampling layer contracts, mirroring the reference's
tests/test_texture.py round-trip and error-contract patterns."""

import numpy as np
import pytest

from stereomatch_tpu.texture import FilterMode, TextureImage


def test_roundtrip_float32_single_channel():
    rng = np.random.default_rng(0)
    img = rng.random((8, 16)).astype(np.float32)
    tex = TextureImage.from_array(img)
    np.testing.assert_array_equal(np.asarray(tex.to_array()), img)


@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_roundtrip_matrix(channels, dtype):
    """dtype x channel matrix, as the reference sweeps
    (tests/test_texture.py:40-114)."""
    rng = np.random.default_rng(1)
    img = (rng.random((6, 10, channels)) * 100).astype(dtype)
    tex = TextureImage.from_array(img)
    assert (tex.height, tex.width, tex.channels) == (6, 10, channels)
    np.testing.assert_array_equal(np.asarray(tex.to_array()), img.squeeze())


def test_three_channels_raises():
    with pytest.raises(RuntimeError):
        TextureImage(np.zeros((4, 4, 3), np.float32))


def test_normalized_coords_require_pow2():
    with pytest.raises(RuntimeError):
        TextureImage(np.zeros((5, 7), np.float32), use_normalized_coords=True)
    TextureImage(np.zeros((8, 16), np.float32), use_normalized_coords=True)


def test_nearest_sampling_identity_at_centres():
    rng = np.random.default_rng(2)
    img = rng.random((7, 9)).astype(np.float32)
    tex = TextureImage.from_array(img)
    np.testing.assert_array_equal(np.asarray(tex.sample_grid()), img)


def test_clamp_addressing():
    """Reads outside the image clamp to the border texel
    (cuda_texture.cpp clamp addressing)."""
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    tex = TextureImage.from_array(img)
    out = np.asarray(tex.sample(np.array([-5.0, 100.0]),
                                np.array([-5.0, 100.0])))
    assert out[0] == img[0, 0]
    assert out[1] == img[2, 3]


def test_bilinear_midpoint():
    img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    tex = TextureImage(img, filter_mode=FilterMode.LINEAR)
    # Texel centres are at +0.5; sampling at (1.0, 1.0) averages all four.
    out = float(tex.sample(np.array([1.0]), np.array([1.0]))[0])
    assert out == pytest.approx(1.5)


def test_normalized_coordinate_sampling():
    img = np.arange(32, dtype=np.float32).reshape(4, 8)
    tex = TextureImage(img, use_normalized_coords=True)
    out = float(tex.sample(np.array([0.5]), np.array([0.5]))[0])
    assert out == img[2, 4]


def test_release_is_noop():
    tex = TextureImage(np.zeros((4, 4), np.float32))
    tex.release()
    assert tex.width == 4
