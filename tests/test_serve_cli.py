"""stm-serve HTTP service end to end: in-process server on an ephemeral
port, stdlib urllib client, synthetic side-by-side frames."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def server():
    from stereomatch_tpu.cli.serve import build_parser, make_server
    args = build_parser().parse_args(
        [str(D), "--port", "0", "--backend", "xla"])
    srv = make_server(args)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def _sbs_png():
    from PIL import Image
    left, right, gt = synthetic_stereo_pair(32, 48, D, seed=3)
    sbs = np.concatenate([(left * 255).astype(np.uint8),
                          (right * 255).astype(np.uint8)], axis=1)
    buf = io.BytesIO()
    Image.fromarray(sbs).save(buf, "PNG")
    return buf.getvalue(), left, right, gt


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as resp:
        info = json.loads(resp.read())
    assert info["status"] == "ok"
    assert info["max_disparity"] == D
    assert info["config"] == "census-wta-sgm"


def test_estimate_npy_matches_local_pipeline(server):
    from stereomatch_tpu.cli_common import create_pipeline
    body, left, right, _ = _sbs_png()
    req = urllib.request.Request(f"{server}/estimate?format=npy", data=body)
    with urllib.request.urlopen(req) as resp:
        disp = np.load(io.BytesIO(resp.read()))
    # The server decodes the PNG to uint8 grayscale; match the same
    # truncation the fixture used when writing it.
    l8 = (left * 255).astype(np.uint8).astype(np.float32)
    r8 = (right * 255).astype(np.uint8).astype(np.float32)
    pipe = create_pipeline("census", "wta", "sgm", max_disparity=D,
                           backend="xla")
    np.testing.assert_array_equal(disp, np.asarray(pipe.estimate(l8, r8)))


def test_estimate_png16_and_refine(server):
    from PIL import Image
    body, _, _, _ = _sbs_png()
    req = urllib.request.Request(f"{server}/estimate?format=png16&refine=1",
                                 data=body)
    with urllib.request.urlopen(req) as resp:
        assert resp.headers["Content-Type"] == "image/png"
        img = Image.open(io.BytesIO(resp.read()))
    arr = np.asarray(img)
    assert arr.shape == (32, 48)
    assert arr.max() < D


def test_estimate_speckle_matches_local_filter(server):
    from stereomatch_tpu.cli_common import create_pipeline
    from stereomatch_tpu.ops.refine import filter_speckles
    body, left, right, _ = _sbs_png()
    req = urllib.request.Request(
        f"{server}/estimate?format=npy&speckle=1", data=body)
    with urllib.request.urlopen(req) as resp:
        disp = np.load(io.BytesIO(resp.read()))
    l8 = (left * 255).astype(np.uint8).astype(np.float32)
    r8 = (right * 255).astype(np.uint8).astype(np.float32)
    pipe = create_pipeline("census", "wta", "sgm", max_disparity=D,
                           backend="xla")
    raw = np.asarray(pipe.estimate(l8, r8)).astype(np.float32)
    expected = np.asarray(filter_speckles(raw, fill="background"))
    np.testing.assert_array_equal(disp, expected)


def test_estimate_rejects_garbage(server):
    req = urllib.request.Request(f"{server}/estimate", data=b"not a png")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400
        assert "error" in json.loads(err.read())


def test_unknown_path_404(server):
    try:
        urllib.request.urlopen(f"{server}/nope")
        assert False, "expected HTTP 404"
    except urllib.error.HTTPError as err:
        assert err.code == 404
