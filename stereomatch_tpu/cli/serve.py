#!/usr/bin/env python
"""stm-serve: HTTP disparity service over the compiled pipeline.

Production-serving face of the engine (beyond the reference's CLI
surface — its closest analogue is the interactive video loop,
stereomatch/cli_video.py:49-126).  One pipeline is configured and
compiled at startup exactly like ``stm-image`` (same ``-cm/-am/-dm``
registries, penalties, backend, dtype, pyramid mode); requests then ride
the warm XLA executable — no per-request compilation, tracing, or
configuration.

Protocol (stdlib-only on both ends):

* ``POST /estimate`` — body: one side-by-side stereo image (left|right
  halves, any PIL-readable format; the ``stm-video`` frame convention).
  Query parameters: ``format=png16|png|pfm|npy`` (default ``png16``:
  uint16 grayscale disparities; ``png`` = colorized visualization),
  ``refine=1`` for median + sub-pixel, ``speckle=1`` for
  windowed-support speckle suppression (background fill), per request
  (float outputs round under png16).
* ``GET /healthz`` — JSON: status, the serving config, frames served.

Threaded server: decode/encode run concurrently while JAX serializes
device work per process — the standard single-chip serving shape.  For
multi-chip serving use the batched paths (``stm-video --mesh`` /
``StreamingEstimator``); HTTP request batching is deliberately out of
scope here (one request = one frame = one jitted call).
"""

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_parser() -> argparse.ArgumentParser:
    from ..cli_common import (AGGREGATION_METHODS, COST_METHODS,
                              DISPARITY_METHODS)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("max_disparity", metavar="max-disparity", type=int)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8792)
    parser.add_argument("-cm", "--cost-method", choices=COST_METHODS.keys(),
                        default="census")
    parser.add_argument("-am", "--aggregation-method",
                        choices=AGGREGATION_METHODS.keys(), default="sgm")
    parser.add_argument("-dm", "--disparity-method",
                        choices=DISPARITY_METHODS.keys(), default="wta")
    parser.add_argument("--p1", type=float, default=0.1)
    parser.add_argument("--p2", type=float, default=0.2)
    parser.add_argument("--backend", choices=("auto", "pallas", "xla"),
                        default="auto")
    parser.add_argument("--dtype", choices=("float32", "bfloat16"),
                        default="float32")
    parser.add_argument("--pyramid", type=int, default=0, metavar="LEVELS",
                        help="Serve the coarse-to-fine pyramid instead of "
                             "the flat pipeline (overrides -cm/-am/-dm).")
    parser.add_argument("--device", default=None,
                        help="JAX platform (tpu/cpu); default = best "
                             "available.")
    parser.add_argument("--warmup", default=None, metavar="HxW",
                        help="Compile for this frame geometry at startup "
                             "so the first request doesn't pay the "
                             "compile (e.g. 375x450).")
    return parser


def _build_pipeline(args):
    if args.pyramid > 0:
        import jax.numpy as jnp

        from ..pyramid import PyramidPipeline
        return PyramidPipeline(
            args.max_disparity, levels=args.pyramid,
            penalty1=args.p1, penalty2=args.p2, backend=args.backend,
            cost_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
            else jnp.float32)
    from ..cli_common import create_pipeline
    return create_pipeline(args.cost_method, args.disparity_method,
                           args.aggregation_method,
                           max_disparity=args.max_disparity,
                           penalty1=args.p1, penalty2=args.p2,
                           backend=args.backend, volume_dtype=args.dtype)


def _encode(disparity, fmt: str, max_disparity: int):
    """disparity [H, W] -> (bytes, content_type)."""
    import numpy as np

    if fmt == "npy":
        buf = io.BytesIO()
        np.save(buf, np.asarray(disparity))
        return buf.getvalue(), "application/octet-stream"
    if fmt == "pfm":
        from ..io.data import write_pfm
        buf = io.BytesIO()
        write_pfm(buf, np.asarray(disparity, np.float32))
        return buf.getvalue(), "application/octet-stream"
    from PIL import Image
    buf = io.BytesIO()
    if fmt == "png":
        from ..utils.viz import colorize_disparity
        Image.fromarray(colorize_disparity(np.asarray(disparity),
                                           max_disparity)).save(buf, "PNG")
        return buf.getvalue(), "image/png"
    if fmt == "png16":
        d16 = np.clip(np.round(np.asarray(disparity, np.float64)),
                      0, 65535).astype(np.uint16)
        # Pillow infers I;16 from the uint16 dtype; passing mode= is
        # deprecated (removal scheduled for Pillow 13).
        Image.fromarray(d16).save(buf, "PNG")
        return buf.getvalue(), "image/png"
    raise ValueError(f"unknown format {fmt!r}")


class _State:
    """Pipeline + counters shared across handler threads; device calls
    serialize through one lock (JAX dispatch is per-process anyway —
    decode/encode are the parts worth overlapping)."""

    def __init__(self, args):
        self.args = args
        self.pipeline = _build_pipeline(args)
        self.frames = 0
        self.lock = threading.Lock()

    def estimate(self, left, right, refine: bool, count: bool = True):
        with self.lock:
            if refine:
                out = self.pipeline.estimate_refined(left, right)
            else:
                out = self.pipeline.estimate(left, right)
            if count:
                self.frames += 1
            return out


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *hargs):        # quiet by default
            pass

        def _reply(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                self._reply(404, b'{"error": "not found"}')
                return
            a = state.args
            info = {"status": "ok", "frames_served": state.frames,
                    "max_disparity": a.max_disparity,
                    "config": (f"pyramid{a.pyramid}" if a.pyramid
                               else "-".join(filter(None, [
                                   a.cost_method, a.disparity_method,
                                   a.aggregation_method]))),
                    "dtype": a.dtype, "backend": a.backend}
            self._reply(200, json.dumps(info).encode())

        # Drop handlers whose socket stalls instead of blocking the
        # worker thread forever (BaseHTTPRequestHandler honors this).
        timeout = 30
        _MAX_BODY = 64 * 1024 * 1024     # generous for any stereo frame

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse
            import numpy as np

            url = urlparse(self.path)
            if url.path != "/estimate":
                self._reply(404, b'{"error": "not found"}')
                return
            q = parse_qs(url.query)
            fmt = q.get("format", ["png16"])[0]
            refine = q.get("refine", ["0"])[0] in ("1", "true")
            speckle = q.get("speckle", ["0"])[0] in ("1", "true")

            # Client-fault stages -> 400; anything past decode is a
            # server fault -> 500 (a dead device must not look like a
            # stream of bad clients to load balancers).
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if not 0 < length <= self._MAX_BODY:
                    raise ValueError(
                        f"Content-Length must be in (0, {self._MAX_BODY}]")
                if fmt not in ("png16", "png", "pfm", "npy"):
                    raise ValueError(f"unknown format {fmt!r}")
                from PIL import Image
                from ..io.capture import split_side_by_side
                img = Image.open(io.BytesIO(self.rfile.read(length)))
                gray = np.asarray(img.convert("L"), np.float32)
                pair = split_side_by_side(gray)
                left, right = np.asarray(pair.left), np.asarray(pair.right)
            except Exception as exc:     # noqa: BLE001 — client fault
                self._reply(400, json.dumps({"error": str(exc)}).encode())
                return
            try:
                disp = np.asarray(state.estimate(left, right, refine))
                if speckle:
                    from ..ops.refine import filter_speckles
                    disp = np.asarray(filter_speckles(
                        disp.astype(np.float32), fill="background"))
                body, ctype = _encode(disp, fmt, state.args.max_disparity)
            except Exception as exc:     # noqa: BLE001 — server fault
                self._reply(500, json.dumps({"error": str(exc)}).encode())
                return
            self._reply(200, body, ctype)

    return Handler


def make_server(args) -> ThreadingHTTPServer:
    """Build (but don't run) the server — the test seam; ``server_port``
    reports the bound port when ``--port 0`` asked for an ephemeral one."""
    state = _State(args)
    if args.warmup:
        import numpy as np
        h, w = (int(v) for v in args.warmup.split("x"))
        z = np.zeros((h, w), np.float32)
        state.estimate(z, z, refine=False, count=False)
    return ThreadingHTTPServer((args.host, args.port), _make_handler(state))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    server = make_server(args)
    print(f"stm-serve listening on http://{args.host}:{server.server_port} "
          f"(D={args.max_disparity})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
