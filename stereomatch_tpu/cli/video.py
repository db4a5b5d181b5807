#!/usr/bin/env python
"""CLI for estimating disparity from stereo videos / cameras / frame dirs.

TPU-native equivalent of the reference's ``stm-video``
(stereomatch/cli_video.py:49-126): capture -> (rectify) -> estimate ->
colormap display, with the same q/h/i/w/e/r key bindings when a display is
available.  Adds an ``imgdir`` input mode (image-sequence replay, cv2-free)
and ``--headless`` for environments without a display, where frames are
written to ``--output-dir`` instead.
"""

import argparse
import pickle
import sys


def _print_instructions() -> None:
    print("""Keys:
                  q/Q: Quit the execution.
                  h/H: Show this help message.
                  i/I: Show the current depthmap with matplotlib.
                  w/W: Toggle the rectified view.
                  e/E: Toggle the rgb view.
                  r/R: Pause/resume.
    """)


def build_parser() -> argparse.ArgumentParser:
    from ..cli_common import (AGGREGATION_METHODS, COST_METHODS,
                              DISPARITY_METHODS)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_mode",
                        choices=["dev", "file", "imgdir", "y4m"],
                        metavar="input-mode",
                        help="Camera `dev`ice, video `file`, `imgdir` of "
                             "side-by-side frames, or `y4m` stream "
                             "(native decode, no OpenCV needed).")
    parser.add_argument("input", type=str,
                        help="Device index, video path, or frame directory.")
    parser.add_argument("max_disparity", metavar="max-disparity", type=int,
                        help="Maximum disparity")
    parser.add_argument("-cal", "--calib", help="Calibration pickle.")
    parser.add_argument("-cm", "--cost-method", choices=COST_METHODS.keys(),
                        default="ssd")
    parser.add_argument("-am", "--aggregation-method",
                        choices=AGGREGATION_METHODS.keys(), default=None)
    parser.add_argument("-dm", "--disparity-method",
                        choices=DISPARITY_METHODS.keys(), default="wta")
    parser.add_argument("--device", default=None,
                        help="JAX platform (tpu/cpu); default = best available")
    parser.add_argument("--headless", action="store_true",
                        help="No display: write colorized frames to "
                             "--output-dir and exit at end of stream.")
    parser.add_argument("--output-dir", default="depthmaps",
                        help="Headless output directory.")
    parser.add_argument("--max-frames", type=int, default=None,
                        help="Stop after this many frames.")
    return parser


def _open_capture(args):
    from ..io.capture import (ImageSequenceCapture, StereoCapture,
                              Y4MCapture)
    if args.input_mode == "dev":
        return StereoCapture.from_device(int(args.input))
    if args.input_mode == "file":
        return StereoCapture.from_file(args.input)
    if args.input_mode == "y4m":
        return Y4MCapture(args.input)
    return ImageSequenceCapture.from_directory(args.input)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os
    if args.device:
        os.environ.setdefault("JAX_PLATFORMS", args.device)

    import numpy as np

    from ..cli_common import create_pipeline
    from ..io.calibration import StereoRectifier
    from ..utils.viz import colorize_disparity

    pipeline = create_pipeline(args.cost_method, args.disparity_method,
                               args.aggregation_method,
                               max_disparity=args.max_disparity)
    capture = _open_capture(args)

    rectifier = None
    if args.calib:
        with open(args.calib, "rb") as f:
            rectifier = StereoRectifier.from_state_dict(pickle.load(f))

    headless = args.headless
    if not headless:
        try:
            import cv2  # noqa: F401
        except ImportError:
            print("OpenCV not available; falling back to --headless.")
            headless = True

    out_dir = None
    if headless:
        from pathlib import Path
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)

    _print_instructions()
    do_quit = False
    show_rectified = show_rgb = False
    pause = False
    frame_idx = 0
    ok = True

    while not do_quit:
        if not pause:
            ok, cap = capture.read_next()
        if not ok:
            break
        if args.max_frames is not None and frame_idx >= args.max_frames:
            break

        joined = cap.joined
        frame0, frame1, _ = cap.to_grayscale()

        if rectifier is not None:
            frame0, frame1 = (np.asarray(x) for x in
                              rectifier(frame0, frame1))

        depthmap = np.asarray(pipeline.estimate(
            np.asarray(frame0, np.float32),
            np.asarray(frame1, np.float32)))
        rgb_depthmap = colorize_disparity(depthmap, args.max_disparity)
        frame_idx += 1

        if headless:
            from PIL import Image
            Image.fromarray(rgb_depthmap).save(
                out_dir / f"depth_{frame_idx:06d}.png")
            continue

        import cv2
        if show_rectified:
            cv2.imshow("rgb", joined)
        if show_rgb:
            cv2.imshow("rectified", np.hstack([frame0, frame1]))
        cv2.imshow("depthmap", rgb_depthmap[:, :, ::-1])  # RGB -> BGR
        key = cv2.waitKey(1)
        chr_key = chr(key & 0xFF).lower()
        if chr_key == "q":
            do_quit = True
        elif chr_key == "h":
            _print_instructions()
        elif chr_key == "i":
            import matplotlib.pyplot as plt
            plt.imshow(depthmap)
            plt.show()
        elif chr_key == "w":
            show_rectified = not show_rectified
            if not show_rectified:
                cv2.destroyWindow("rgb")
        elif chr_key == "e":
            show_rgb = not show_rgb
            if not show_rgb:
                cv2.destroyWindow("rectified")
        elif chr_key == "r":
            pause = not pause

    capture.close()
    if not headless:
        import cv2
        cv2.destroyAllWindows()
    else:
        print(f"Wrote {frame_idx} depthmaps to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
