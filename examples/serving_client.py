#!/usr/bin/env python
"""Machine-client example for stm-serve: raw .npy frames in, arrays out.

The serving protocol's fast path for programmatic clients skips image
codecs entirely: POST a raw ``.npy`` side-by-side grayscale frame
(``[H, 2W]``, left|right halves — the ``stm-video`` frame convention)
to ``/estimate?format=npy`` and read the disparity back as ``.npy``
(smallest lossless dtype: uint8/uint16 for integer disparities, float32
when ``refine=1``/``speckle=1`` post-processing runs on the server).

Start a server (any config; census+SGM shown), then run this client:

    stm-serve 64 -cm census --dtype bfloat16 --batch 8 \
              --warmup 375x450 --port 8792 &
    python examples/serving_client.py --url http://127.0.0.1:8792 \
              left.png right.png out.npy [--refine]

With ``--demo`` the client generates a synthetic pair instead of
reading files (zero inputs needed; server must be started with
max-disparity >= 32).
"""

import argparse
import io
import pathlib
import sys
import urllib.request

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def estimate(url: str, left: np.ndarray, right: np.ndarray,
             refine: bool = False, speckle: bool = False,
             timeout: float = 600.0) -> np.ndarray:
    """One round trip: [H, W] grayscale pair -> [H, W] disparity.

    This function is the whole client — copy it into your codebase.
    """
    sbs = np.concatenate([left, right], axis=1)
    body = io.BytesIO()
    np.save(body, sbs)
    query = "format=npy" + ("&refine=1" if refine else "") \
        + ("&speckle=1" if speckle else "")
    req = urllib.request.Request(f"{url}/estimate?{query}",
                                 data=body.getvalue())
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return np.load(io.BytesIO(resp.read()))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--url", default="http://127.0.0.1:8792")
    parser.add_argument("inputs", nargs="*",
                        help="LEFT RIGHT OUT.npy (image files in, "
                             "disparity .npy out)")
    parser.add_argument("--demo", action="store_true",
                        help="synthetic pair instead of input files")
    parser.add_argument("--refine", action="store_true")
    parser.add_argument("--speckle", action="store_true")
    args = parser.parse_args()

    if args.demo:
        from stereomatch_tpu.io.synthetic import stereo_pair
        left, right, gt = stereo_pair(120, 160, 32, seed=7)
        left = (left * 255).astype(np.uint8)
        right = (right * 255).astype(np.uint8)
        disp = estimate(args.url, left, right, args.refine, args.speckle)
        bad = float(np.mean(np.abs(disp.astype(np.float32) - gt) > 1))
        print(f"disparity {disp.shape} {disp.dtype}; "
              f"bad-pixel vs ground truth: {bad * 100:.2f}%")
        return 0

    if len(args.inputs) != 3:
        parser.error("need LEFT RIGHT OUT.npy (or --demo)")
    from stereomatch_tpu.io.data import load_image
    left = load_image(args.inputs[0], grayscale=True).astype(np.uint8)
    right = load_image(args.inputs[1], grayscale=True).astype(np.uint8)
    disp = estimate(args.url, left, right, args.refine, args.speckle)
    np.save(args.inputs[2], disp)
    print(f"{args.inputs[2]}: {disp.shape} {disp.dtype}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
