#!/usr/bin/env python
"""CLI for estimating disparity from a stereo image pair.

TPU-native equivalent of the reference's ``stm-image``
(stereomatch/cli_image.py:34-100).  The ``-c/--cuda-on`` flag becomes
``--device`` (JAX picks the TPU automatically; ``--device cpu`` forces the
host backend).
"""

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    from ..cli_common import (AGGREGATION_METHODS, COST_METHODS,
                              DISPARITY_METHODS)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("left_image", metavar="left-image", help="Left image")
    parser.add_argument("right_image", metavar="right-image",
                        help="Right image")
    parser.add_argument("max_disparity", metavar="max-disparity", type=int,
                        help="Maximum disparity for stereo matching.")
    parser.add_argument("output_depthmap", metavar="output-depthmap",
                        help="Output file for the depth map.")
    parser.add_argument("-cm", "--cost-method", choices=COST_METHODS.keys(),
                        default="ssd", help="Cost function.")
    parser.add_argument("-am", "--aggregation-method",
                        choices=AGGREGATION_METHODS.keys(), default=None,
                        help="Aggregation method.")
    parser.add_argument("-dm", "--disparity-method",
                        choices=DISPARITY_METHODS.keys(), default="wta",
                        help="Disparity reduce method.")
    parser.add_argument("--device", default=None,
                        help="JAX platform to run on (e.g. tpu, cpu). "
                             "Defaults to the best available backend.")
    parser.add_argument("-sd", "--show-depthmap", action="store_true",
                        help="Show the depthmap interactively.")
    parser.add_argument("-fig", "--figure", action="store_true",
                        help="Render inputs alongside the depthmap.")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os
    if args.device:
        os.environ.setdefault("JAX_PLATFORMS", args.device)

    import numpy as np
    from PIL import Image

    from ..cli_common import create_pipeline

    pipeline = create_pipeline(args.cost_method, args.disparity_method,
                               args.aggregation_method,
                               max_disparity=args.max_disparity)

    left_rgb = Image.open(args.left_image)
    right_rgb = Image.open(args.right_image)
    left = np.array(left_rgb.convert("L"), np.float32)
    right = np.array(right_rgb.convert("L"), np.float32)

    depthmap = np.asarray(pipeline.estimate(left, right)).astype(np.uint16)

    import matplotlib
    matplotlib.use("Agg" if not args.show_depthmap else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    plt.figure()
    if not args.figure:
        plt.imshow(depthmap)
        plt.axis("off")
    else:
        fig, axs = plt.subplots(1, 3, figsize=(16, 8))
        axs[0].imshow(np.array(left_rgb))
        axs[0].axis("off")
        axs[1].imshow(np.array(right_rgb))
        axs[1].axis("off")
        axs[2].imshow(depthmap)
        axs[2].axis("off")
        fig.tight_layout()
    if args.show_depthmap:
        plt.show()
    plt.savefig(args.output_depthmap)
    plt.close("all")
    return 0


if __name__ == "__main__":
    sys.exit(main())
