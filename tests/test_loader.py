"""Native JPEG loader vs PIL oracle, plus the JPEG serving path."""

import io
import json
import threading

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from detax.serve.loader import decode_jpeg, decode_letterbox, have_native_loader, jpeg_info


def _jpeg_bytes(rng, h=48, w=64, quality=95):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_native_loader_builds():
    assert have_native_loader(), "libjpeg loader should build in this image"


def test_jpeg_info(rng):
    data = _jpeg_bytes(rng, 37, 53)
    assert jpeg_info(data) == (37, 53)


def test_decode_matches_pil(rng):
    data = _jpeg_bytes(rng)
    got = decode_jpeg(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == want.shape
    # decoders may differ by small IDCT rounding
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0


def test_decode_letterbox_geometry(rng):
    data = _jpeg_bytes(rng, 48, 64)
    canvas, scale, nh, nw = decode_letterbox(data, 32)
    assert canvas.shape == (32, 32, 3)
    assert (nh, nw) == (24, 32)
    assert scale == pytest.approx(0.5)
    # padding region stays zero
    assert canvas[24:].sum() == 0


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8garbage-not-a-jpeg")


def test_jpeg_http_path(rng):
    """POST image/jpeg → decoded natively in the runner → detections."""
    import http.client

    from detax.configs.detector import PreprocessConf
    from detax.serve.server import DetectionService, serve
    from tests.test_serve import _FakeModel

    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=2, batch_timeout_ms=5,
    )
    service.start(warmup=False)
    server = serve(service, port=18532)
    try:
        data = _jpeg_bytes(rng, 64, 64)
        conn = http.client.HTTPConnection("127.0.0.1", 18532, timeout=30)
        conn.request("POST", "/detect", body=data, headers={"Content-Type": "image/jpeg"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert out["scores"] == [1.0]
        # fake model returns box [10,10,20,20] in canvas coords; scale 0.5
        np.testing.assert_allclose(out["boxes"][0], [20, 20, 40, 40])
    finally:
        server.shutdown()
        service.stop()
