"""ctypes bindings for libstmio, the native I/O runtime.

The reference binds its native layer with pybind11 (src/_cstereomatch.cpp);
this image has no pybind11, so the library exposes a C ABI and numpy arrays
cross the boundary as raw pointers.  The library auto-builds from
``native/stmio.cpp`` with g++ on first use and the result is cached next to
the source; every entry point has a pure-Python fallback in ``io``, so the
package works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_NATIVE = Path(__file__).resolve().parent.parent.parent / "native"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LOAD_FAILED = False


class NativeIOError(RuntimeError):
    pass


def _build(src: Path, out: Path) -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
           "-shared", "-o", str(out), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    with _LOCK:
        if _LIB is not None or _LOAD_FAILED:
            return _LIB
        so = _REPO_NATIVE / "libstmio.so"
        src = _REPO_NATIVE / "stmio.cpp"
        if not so.exists() or (src.exists()
                               and src.stat().st_mtime > so.stat().st_mtime):
            if not (src.exists() and _build(src, so)):
                _LOAD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            _LOAD_FAILED = True
            return None
        _declare(lib)
        _LIB = lib
        return lib


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.stmio_last_error.restype = c.c_char_p
    lib.stmio_pfm_probe.argtypes = [c.c_char_p] + [c.POINTER(c.c_int32)] * 3
    lib.stmio_pfm_read.argtypes = [c.c_char_p, c.POINTER(c.c_float),
                                   c.c_int64]
    lib.stmio_pfm_write.argtypes = [c.c_char_p, c.POINTER(c.c_float),
                                    c.c_int32, c.c_int32, c.c_int32]
    lib.stmio_pnm_probe.argtypes = [c.c_char_p] + [c.POINTER(c.c_int32)] * 4
    lib.stmio_pnm_read.argtypes = [c.c_char_p, c.POINTER(c.c_uint8),
                                   c.c_int64]
    lib.stmio_pnm_write.argtypes = [c.c_char_p, c.POINTER(c.c_uint8),
                                    c.c_int32, c.c_int32, c.c_int32]
    lib.stmio_y4m_open.argtypes = [c.c_char_p, c.c_int32,
                                   c.POINTER(c.c_void_p)] + \
                                  [c.POINTER(c.c_int32)] * 4
    lib.stmio_y4m_read.argtypes = [c.c_void_p, c.POINTER(c.c_uint8)]
    lib.stmio_y4m_close.argtypes = [c.c_void_p]
    lib.stmio_y4m_close.restype = None
    lib.stmio_y4m_write.argtypes = [c.c_char_p, c.POINTER(c.c_uint8),
                                    c.c_int32, c.c_int32, c.c_int32,
                                    c.c_int32, c.c_int32]


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def _check(lib, code: int, what: str) -> None:
    if code != 0:
        raise NativeIOError(
            f"{what}: {lib.stmio_last_error().decode(errors='replace')}")


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# -- PFM --------------------------------------------------------------------

def read_pfm(path) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise NativeIOError("libstmio unavailable")
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    p = str(path).encode()
    _check(lib, lib.stmio_pfm_probe(p, w, h, ch), "pfm_probe")
    out = np.empty((h.value, w.value, ch.value), np.float32)
    _check(lib, lib.stmio_pfm_read(p, _fptr(out), out.size), "pfm_read")
    return out[:, :, 0] if ch.value == 1 else out


def write_pfm(path, image: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise NativeIOError("libstmio unavailable")
    image = np.ascontiguousarray(image, np.float32)
    ch = 1 if image.ndim == 2 else image.shape[2]
    _check(lib, lib.stmio_pfm_write(str(path).encode(), _fptr(image),
                                    image.shape[1], image.shape[0], ch),
           "pfm_write")


# -- PGM / PPM --------------------------------------------------------------

def read_pnm(path) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise NativeIOError("libstmio unavailable")
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    mv = ctypes.c_int32()
    p = str(path).encode()
    _check(lib, lib.stmio_pnm_probe(p, w, h, ch, mv), "pnm_probe")
    out = np.empty((h.value, w.value, ch.value), np.uint8)
    _check(lib, lib.stmio_pnm_read(p, _u8ptr(out), out.size), "pnm_read")
    return out[:, :, 0] if ch.value == 1 else out


def write_pnm(path, image: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise NativeIOError("libstmio unavailable")
    image = np.ascontiguousarray(image, np.uint8)
    ch = 1 if image.ndim == 2 else image.shape[2]
    _check(lib, lib.stmio_pnm_write(str(path).encode(), _u8ptr(image),
                                    image.shape[1], image.shape[0], ch),
           "pnm_write")


# -- Y4M --------------------------------------------------------------------

class Y4MReader:
    """Streaming luma reader over a YUV4MPEG2 file.

    ``prefetch`` > 0 runs decode on a native thread with a ring buffer of
    that depth, overlapping file I/O with device compute — the steady-state
    role the reference's reusable pipeline buffers play (pipeline.py:65-67),
    moved to the host data path.
    """

    def __init__(self, path, prefetch: int = 2):
        lib = _load()
        if lib is None:
            raise NativeIOError("libstmio unavailable")
        self._lib = lib
        handle = ctypes.c_void_p()
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        fn = ctypes.c_int32()
        fd = ctypes.c_int32()
        _check(lib, lib.stmio_y4m_open(str(path).encode(), prefetch,
                                       handle, w, h, fn, fd), "y4m_open")
        self._handle = handle
        self.width = w.value
        self.height = h.value
        self.fps = (fn.value, fd.value)

    def read(self) -> Optional[np.ndarray]:
        """Next grayscale frame [H, W] uint8, or None at end of stream."""
        if self._handle is None:
            return None
        out = np.empty((self.height, self.width), np.uint8)
        code = self._lib.stmio_y4m_read(self._handle, _u8ptr(out))
        if code == 1:
            return None
        _check(self._lib, code, "y4m_read")
        return out

    def close(self) -> None:
        if self._handle is not None:
            self._lib.stmio_y4m_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()

    def __iter__(self):
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame


def write_y4m(path, frames: np.ndarray, fps: Tuple[int, int] = (30, 1)):
    """Write mono frames [N, H, W] uint8 as a Y4M stream."""
    lib = _load()
    if lib is None:
        raise NativeIOError("libstmio unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w = frames.shape
    _check(lib, lib.stmio_y4m_write(str(path).encode(), _u8ptr(frames),
                                    n, w, h, fps[0], fps[1]), "y4m_write")
