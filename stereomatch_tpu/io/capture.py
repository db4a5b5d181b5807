"""Stereo frame capture: cameras, video files and image sequences.

Mirrors the reference (stereomatch/capture.py:12-98).  Side-by-side frames
are split at width/2 (capture.py:82-91).  OpenCV is an optional dependency:
camera/video sources need it; :class:`ImageSequenceCapture` (a capability the
reference lacks — useful for tests and datasets) does not.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

# ITU-R BT.601 luma weights, matching cv2.cvtColor BGR2GRAY.
_BGR_WEIGHTS = np.array([0.114, 0.587, 0.299], np.float32)


def to_grayscale_array(image: np.ndarray) -> np.ndarray:
    """BGR [H, W, 3] uint8 -> grayscale [H, W] uint8 (BT.601)."""
    if image.ndim == 2:
        return image
    gray = image.astype(np.float32) @ _BGR_WEIGHTS
    return np.round(gray).astype(np.uint8)


@dataclass
class StereoCaptureImage:
    """A captured stereo frame: left / right halves plus the joined frame.

    Arrays are BGR [H, W, 3] uint8 (reference: capture.py:12-33).
    """
    left: Optional[np.ndarray] = None
    right: Optional[np.ndarray] = None
    joined: Optional[np.ndarray] = None

    def __iter__(self):
        return iter((self.left, self.right, self.joined))

    def to_grayscale(self) -> "StereoCaptureImage":
        return StereoCaptureImage(
            to_grayscale_array(self.left),
            to_grayscale_array(self.right),
            to_grayscale_array(self.joined))


def split_side_by_side(frame: np.ndarray) -> StereoCaptureImage:
    """Split a side-by-side stereo frame at width/2 (capture.py:82-91)."""
    half_width = frame.shape[1] // 2
    return StereoCaptureImage(frame[:, :half_width],
                              frame[:, half_width:half_width * 2],
                              frame)


class StereoCapture:
    """OpenCV-backed stereo video/camera reader
    (reference: capture.py:36-98)."""

    def __init__(self, video_capture):
        self.video_capture = video_capture

    def __del__(self):
        self.close()

    @classmethod
    def from_device(cls, dev_idx: int) -> "StereoCapture":
        if not _HAS_CV2:
            raise RuntimeError("OpenCV is required for camera capture")
        cap = cv2.VideoCapture(dev_idx)
        if not cap.isOpened():
            raise RuntimeError(f"Unable to open camera {dev_idx}")
        return cls(cap)

    @classmethod
    def from_file(cls, filepath: Union[str, Path]) -> "StereoCapture":
        if not _HAS_CV2:
            raise RuntimeError("OpenCV is required for video-file capture")
        cap = cv2.VideoCapture(str(filepath))
        if not cap.isOpened():
            raise RuntimeError(f"Unable to open file {filepath}")
        return cls(cap)

    def read_next(self) -> Tuple[bool, StereoCaptureImage]:
        ok, frame = self.video_capture.read()
        if not ok:
            return False, StereoCaptureImage()
        return True, split_side_by_side(frame)

    def close(self) -> None:
        if self.video_capture is not None:
            self.video_capture.release()
            self.video_capture = None


class Y4MCapture:
    """Side-by-side stereo capture over a YUV4MPEG2 stream (native path).

    Decode runs on a libstmio prefetch thread (stereomatch_tpu.native
    .Y4MReader), overlapping file I/O with device compute.  Frames are
    grayscale luma; same read_next contract as :class:`StereoCapture`.
    Produce streams with ``ffmpeg -i any.mp4 -pix_fmt yuv420p out.y4m``.
    """

    def __init__(self, path, prefetch: int = 2):
        from .. import native
        if not native.available():
            raise RuntimeError("Y4MCapture needs the native I/O library "
                               "(native/libstmio.so; `make -C native`)")
        self._reader = native.Y4MReader(path, prefetch=prefetch)
        self.width = self._reader.width
        self.height = self._reader.height
        self.fps = self._reader.fps

    def read_next(self) -> Tuple[bool, StereoCaptureImage]:
        frame = self._reader.read()
        if frame is None:
            return False, StereoCaptureImage()
        return True, split_side_by_side(frame)

    def close(self) -> None:
        self._reader.close()


class ImageSequenceCapture:
    """Capture over a directory of side-by-side frames (PNG/JPG), or over
    paired left/right file lists.  cv2-free; useful for tests and replays."""

    def __init__(self, frames):
        self._frames = list(frames)
        self._pos = 0

    @classmethod
    def from_directory(cls, directory, pattern: str = "*.png"):
        paths = sorted(Path(directory).glob(pattern))
        if not paths:
            raise RuntimeError(f"No frames matching {pattern} in {directory}")
        return cls(paths)

    def read_next(self) -> Tuple[bool, StereoCaptureImage]:
        if self._pos >= len(self._frames):
            return False, StereoCaptureImage()
        entry = self._frames[self._pos]
        self._pos += 1
        if isinstance(entry, (str, Path)):
            from .data import load_image
            frame = load_image(entry)
            if frame.ndim == 3:  # PIL loads RGB; capture contract is BGR
                frame = frame[:, :, ::-1]
        else:
            frame = np.asarray(entry)
        return True, split_side_by_side(frame)

    def close(self) -> None:
        self._pos = len(self._frames)
