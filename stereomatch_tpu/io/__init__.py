from .calibration import StereoRectifier, warp_perspective
from .capture import (ImageSequenceCapture, StereoCapture, StereoCaptureImage,
                      split_side_by_side, to_grayscale_array)
from .data import (KittiDataset, MiddleburyDataset, load_image,
                   parse_middlebury_calib,
                   read_pfm, write_pfm)

__all__ = [
    "ImageSequenceCapture",
    "KittiDataset",
    "MiddleburyDataset",
    "StereoCapture",
    "StereoCaptureImage",
    "StereoRectifier",
    "load_image",
    "parse_middlebury_calib",
    "read_pfm",
    "split_side_by_side",
    "to_grayscale_array",
    "warp_perspective",
    "write_pfm",
]
