"""Serving tier: native batcher, detection service, HTTP contract."""

import dataclasses
import json
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from detax.serve.batcher import DynamicBatcher
from detax.serve.server import DetectionService, decode_request, encode_request, serve
from detax.configs.detector import PreprocessConf
from detax.structures.detections import Detections


def test_native_batcher_roundtrip():
    b = DynamicBatcher(max_batch=4, batch_timeout_ms=10, item_bytes=64)

    def runner():
        served = 0
        while served < 8:
            ids, payloads = b.next_batch()
            for i, rid in enumerate(ids):
                b.post_result(rid, bytes(payloads[i][:5]) + b"-ok")
                served += 1

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    results = {}

    def client(k):
        rid = b.submit(f"req{k:02d}".encode())
        results[k] = b.wait_result(rid, 64)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(8)]
    [x.start() for x in threads]
    [x.join(timeout=30) for x in threads]
    assert len(results) == 8
    for k, v in results.items():
        assert v == f"req{k:02d}".encode() + b"-ok"
    assert b.completed() == 8
    assert b.latency_percentile_ms(50) > 0
    b.close()


def test_batcher_coalesces():
    b = DynamicBatcher(max_batch=8, batch_timeout_ms=200, item_bytes=16)
    for k in range(8):
        b.submit(bytes([k]))
    ids, payloads = b.next_batch()
    assert len(ids) == 8  # full batch collected in one pull
    b.close()


def test_request_codec(rng):
    img = (rng.rand(17, 23, 3) * 255).astype(np.uint8)
    payload = encode_request(img)
    back = decode_request(np.frombuffer(payload, np.uint8))
    np.testing.assert_array_equal(back, img)


class _FakeModel:
    """Stands in for a detector: returns one box per image scaled with the
    input so coordinate mapping can be asserted."""

    def apply(self, params, images):
        b = images.pixels.shape[0]
        boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 20.0, 20.0]]), (b, 1))[:, None, :]
        return Detections(
            boxes=boxes,
            scores=jnp.ones((b, 1)),
            classes=jnp.zeros((b, 1), jnp.int32),
            valid=jnp.ones((b, 1), bool),
        )


def test_detection_service_end_to_end(rng):
    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=2, batch_timeout_ms=5,
    )
    service.start()
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)  # scale = 0.5
    out = service.detect(img)
    assert out["scores"] == [1.0]
    # canvas box /0.5 back to original coords
    np.testing.assert_allclose(out["boxes"][0], [20, 20, 40, 40])
    stats = service.stats()
    assert stats["completed"] >= 1
    assert stats["p50_ms"] > 0
    service.stop()


def test_http_contract(rng):
    import http.client

    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=2, batch_timeout_ms=5,
    )
    service.start()
    server = serve(service, port=18531)
    try:
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        conn = http.client.HTTPConnection("127.0.0.1", 18531, timeout=30)
        conn.request(
            "POST", "/detect", body=img.tobytes(), headers={"X-Image-Shape": "32,32,3"}
        )
        resp = conn.getresponse()
        assert resp.status == 200
        data = json.loads(resp.read())
        assert "boxes" in data and "scores" in data and "classes" in data
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["completed"] >= 1
        # keep-alive (HTTP/1.1) regression: every response — including 404
        # and 400 — must carry Content-Length or the persistent connection
        # hangs waiting for more body
        conn.request("GET", "/nope")
        r = conn.getresponse()
        assert r.status == 404 and r.read() == b""
        conn.request("POST", "/detect", body=b"x", headers={"X-Image-Shape": "banana"})
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())
        # connection still alive after the error responses
        conn.request("GET", "/stats")
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()
        service.stop()


def _jpeg(rng, h, w):
    import io

    from PIL import Image

    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def test_jpeg_fast_path_and_binary(rng):
    """All-JPEG batches ride the 4:2:0 device program; binary submissions
    come back as encode_result_bin blobs with identical content to JSON."""
    from detax.serve.server import decode_result_bin

    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=4, batch_timeout_ms=5,
    )
    service.start(warmup=False)
    try:
        jpegs = [_jpeg(rng, 64, 64) for _ in range(3)]
        js = service.detect_many_jpeg(jpegs)
        blobs = service.detect_many_jpeg(jpegs, binary=True)
        assert len(js) == len(blobs) == 3
        for j, blob in zip(js, blobs):
            d, off = decode_result_bin(blob)
            assert off == len(blob)
            np.testing.assert_allclose(d["boxes"], np.asarray(j["boxes"]), rtol=1e-6)
            np.testing.assert_allclose(d["scores"], j["scores"], rtol=1e-6)
            np.testing.assert_array_equal(d["classes"], j["classes"])
            # fake model box [10,10,20,20] at scale 0.5 → [20,20,40,40]
            np.testing.assert_allclose(d["boxes"][0], [20, 20, 40, 40], atol=1e-3)
    finally:
        service.stop()


def test_yuv_device_conversion_matches_host(rng):
    """The jitted YUV→RGB conversion equals the host reconstruction used in
    the loader parity test — closing the train/serve-style skew chain:
    native decode ↔ host recon (test_loader) ↔ device program (here)."""
    import jax

    from detax.serve.server import yuv_flat_to_rgb
    from tests.test_loader import _yuv_slot_to_rgb

    S = 32
    slot = (rng.rand(2, S * S * 3 // 2) * 255).astype(np.uint8)
    dev = np.asarray(jax.jit(lambda f: yuv_flat_to_rgb(f, S))(jnp.asarray(slot)))
    host = np.stack([_yuv_slot_to_rgb(s, S) for s in slot])
    np.testing.assert_allclose(dev, host, atol=1e-3)


def test_http_jpeg_batch_framing_and_stats_reset(rng):
    """DXJB-framed JPEG batch over HTTP: JSON and binary responses; the
    /stats/reset endpoint gives per-run measurement windows."""
    import http.client
    import struct as _struct

    from detax.serve.server import decode_result_bin

    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=4, batch_timeout_ms=5,
    )
    service.start(warmup=False)
    server = serve(service, port=18533)
    try:
        jpegs = [_jpeg(rng, 64, 64) for _ in range(2)]
        body = b"DXJB" + b"".join(_struct.pack("<I", len(j)) + j for j in jpegs)
        conn = http.client.HTTPConnection("127.0.0.1", 18533, timeout=30)
        conn.request("POST", "/detect_batch", body=body)
        data = json.loads(conn.getresponse().read())
        assert len(data["results"]) == 2
        np.testing.assert_allclose(data["results"][0]["boxes"][0], [20, 20, 40, 40], atol=1e-3)
        # binary response
        conn.request(
            "POST", "/detect_batch", body=body,
            headers={"Accept": "application/octet-stream"},
        )
        blob = conn.getresponse().read()
        (cnt,) = _struct.unpack_from("<I", blob, 0)
        assert cnt == 2
        off = 4
        for _ in range(cnt):
            d, off = decode_result_bin(blob, off)
            np.testing.assert_allclose(d["boxes"][0], [20, 20, 40, 40], atol=1e-3)
        assert off == len(blob)
        # stats cover the work so far; reset zeroes the window
        assert service.stats()["completed"] >= 4
        conn.request("POST", "/stats/reset")
        assert conn.getresponse().status == 200
        s = service.stats()
        assert s["completed"] == 0 and s["p50_ms"] == 0
    finally:
        server.shutdown()
        service.stop()


def test_http_detect_batch(rng):
    """/detect_batch: N header-framed images in ONE request → {"results":
    [...]} — amortizes the per-request HTTP host cost (1-core hosts measure
    the front end, not the chip, as the per-request bound)."""
    import http.client

    from detax.serve.server import encode_request

    service = DetectionService(
        _FakeModel(), params={}, preprocess_conf=PreprocessConf(image_size=32),
        max_batch=4, batch_timeout_ms=5,
    )
    service.start()
    server = serve(service, port=18532)
    try:
        imgs = [(rng.rand(64, 64, 3) * 255).astype(np.uint8) for _ in range(3)]
        body = b"".join(encode_request(im) for im in imgs)
        conn = http.client.HTTPConnection("127.0.0.1", 18532, timeout=30)
        conn.request("POST", "/detect_batch", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        data = json.loads(resp.read())
        assert len(data["results"]) == 3
        for r in data["results"]:
            assert r["scores"] == [1.0]
            np.testing.assert_allclose(r["boxes"][0], [20, 20, 40, 40])
        # malformed batch → JSON 400
        conn.request("POST", "/detect_batch", body=b"")
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())
    finally:
        server.shutdown()
        service.stop()
