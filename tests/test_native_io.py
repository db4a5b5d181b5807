"""Native I/O runtime (libstmio) tests: codecs, capture, fallback parity.

The native library auto-builds from native/stmio.cpp with g++; tests skip
if no toolchain is present.  The pure-Python PFM parser (io/data.py) is the
cross-check oracle.
"""

import numpy as np
import pytest

from stereomatch_tpu import native
from stereomatch_tpu.io import capture, data

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_pfm_roundtrip_and_python_parity(tmp_path, rng):
    img = rng.random((37, 53)).astype(np.float32)
    native.write_pfm(tmp_path / "a.pfm", img)
    np.testing.assert_array_equal(native.read_pfm(tmp_path / "a.pfm"), img)

    # The io-layer reader (which dispatches to native when available) and
    # the native reader must agree on the same file.
    np.testing.assert_array_equal(data.read_pfm(tmp_path / "a.pfm"), img)

    # Pure-Python fallback parser reads the native writer's output too.
    monkey = pytest.MonkeyPatch()
    try:
        monkey.setattr(native, "available", lambda: False)
        np.testing.assert_array_equal(data.read_pfm(tmp_path / "a.pfm"), img)
    finally:
        monkey.undo()


def test_pfm_color(tmp_path, rng):
    img = rng.random((11, 7, 3)).astype(np.float32)
    native.write_pfm(tmp_path / "c.pfm", img)
    np.testing.assert_array_equal(native.read_pfm(tmp_path / "c.pfm"), img)


def test_pnm_roundtrip(tmp_path, rng):
    gray = (rng.random((21, 33)) * 255).astype(np.uint8)
    native.write_pnm(tmp_path / "g.pgm", gray)
    np.testing.assert_array_equal(native.read_pnm(tmp_path / "g.pgm"), gray)

    color = (rng.random((9, 13, 3)) * 255).astype(np.uint8)
    native.write_pnm(tmp_path / "c.ppm", color)
    np.testing.assert_array_equal(native.read_pnm(tmp_path / "c.ppm"), color)


def test_pnm_via_load_image(tmp_path, rng):
    gray = (rng.random((17, 19)) * 255).astype(np.uint8)
    native.write_pnm(tmp_path / "img.pgm", gray)
    np.testing.assert_array_equal(data.load_image(tmp_path / "img.pgm"), gray)


def test_grayscale_matches_pil_exactly(tmp_path, rng):
    """Color PPM loaded grayscale must give identical bytes via the native
    codec path and the PIL fallback (environment-independent metrics)."""
    from PIL import Image
    color = (rng.random((23, 31, 3)) * 255).astype(np.uint8)
    native.write_pnm(tmp_path / "c.ppm", color)
    native_gray = data.load_image(tmp_path / "c.ppm", grayscale=True)
    pil_gray = np.array(Image.fromarray(color).convert("L"))
    np.testing.assert_array_equal(native_gray, pil_gray)
    np.testing.assert_array_equal(data.rgb_to_grayscale_u8(color), pil_gray)


def test_pnm_errors(tmp_path):
    (tmp_path / "bad.pgm").write_bytes(b"P9\n1 1\n255\nx")
    with pytest.raises(native.NativeIOError):
        native.read_pnm(tmp_path / "bad.pgm")
    with pytest.raises(native.NativeIOError):
        native.read_pfm(tmp_path / "missing.pfm")


@pytest.mark.parametrize("prefetch", [0, 3])
def test_y4m_roundtrip(tmp_path, rng, prefetch):
    frames = (rng.random((7, 24, 64)) * 255).astype(np.uint8)
    native.write_y4m(tmp_path / "v.y4m", frames, fps=(25, 1))
    with native.Y4MReader(tmp_path / "v.y4m", prefetch=prefetch) as r:
        assert (r.width, r.height) == (64, 24)
        assert r.fps == (25, 1)
        got = list(r)
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_y4m_capture_side_by_side_split(tmp_path, rng):
    """Y4MCapture splits side-by-side frames like the reference capture
    (capture.py:82-91)."""
    frames = (rng.random((3, 16, 40)) * 255).astype(np.uint8)
    native.write_y4m(tmp_path / "sbs.y4m", frames)
    cap = capture.Y4MCapture(tmp_path / "sbs.y4m")
    for i in range(3):
        ok, img = cap.read_next()
        assert ok
        np.testing.assert_array_equal(img.left, frames[i][:, :20])
        np.testing.assert_array_equal(img.right, frames[i][:, 20:])
    ok, _ = cap.read_next()
    assert not ok
    cap.close()
