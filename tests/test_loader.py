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


def test_yuv_letterbox_geometry_matches_rgb(rng):
    """The 4:2:0 fast path must report the SAME scale/size mapping as the
    RGB letterbox (box coordinates depend on it)."""
    from detax.serve.loader import decode_letterbox_yuv, yuv_slot_bytes

    data = _jpeg_bytes(rng, 48, 64)
    _, s_rgb, nh_rgb, nw_rgb = decode_letterbox(data, 32)
    slot, s, nh, nw = decode_letterbox_yuv(data, 32)
    assert slot.shape == (yuv_slot_bytes(32),)
    assert (s, nh, nw) == (s_rgb, nh_rgb, nw_rgb)
    # Y padding zero, chroma padding neutral (128) => padded RGB stays black
    y = slot[: 32 * 32].reshape(32, 32)
    c = slot[32 * 32 :].reshape(16, 16, 2)
    assert y[nh:].sum() == 0
    assert (c[(nh + 1) // 2 :] == 128).all()


def _yuv_slot_to_rgb(slot, canvas):
    """Host-side reconstruction of the device conversion (nearest chroma
    upsample + BT.601 full range) for parity tests."""
    y = slot[: canvas * canvas].reshape(canvas, canvas).astype(np.float32)
    c = slot[canvas * canvas :].reshape(canvas // 2, canvas // 2, 2).astype(np.float32) - 128.0
    c = np.repeat(np.repeat(c, 2, 0), 2, 1)
    cb, cr = c[..., 0], c[..., 1]
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], -1
    )
    return np.clip(rgb, 0, 255)


def test_yuv_letterbox_pixels_match_rgb(rng):
    """Reconstructed RGB from the 4:2:0 slot ≈ the RGB letterbox canvas.
    Differences come only from half-resolution chroma + rounding; on real
    image content they are a few LSB."""
    # smooth-ish image (random noise has pathological chroma; photos don't)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([yy * 2 % 255, xx * 2 % 255, (yy + xx) % 255], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    data = buf.getvalue()
    rgb, s, nh, nw = decode_letterbox(data, 64)
    from detax.serve.loader import decode_letterbox_yuv

    slot, s2, nh2, nw2 = decode_letterbox_yuv(data, 64)
    assert (s, nh, nw) == (s2, nh2, nw2)
    recon = _yuv_slot_to_rgb(slot, 64)
    diff = np.abs(recon[:nh, :nw] - rgb[:nh, :nw].astype(np.float32))
    assert diff.mean() < 4.0, diff.mean()


def test_yuv_batch_matches_single(rng):
    """One native batch call == N single calls (bit-exact), and the
    zero-copy view variant agrees too."""
    from detax.serve.loader import (
        decode_letterbox_yuv,
        decode_letterbox_yuv_batch,
        decode_letterbox_yuv_batch_view,
        have_native_loader,
        yuv_slot_bytes,
    )

    datas = [_jpeg_bytes(rng, 40 + 8 * i, 56, quality=90) for i in range(4)]
    out, sizes, scales, fails = decode_letterbox_yuv_batch(datas, 32)
    assert fails == 0
    for i, d in enumerate(datas):
        slot, s, nh, nw = decode_letterbox_yuv(d, 32)
        np.testing.assert_array_equal(out[i], slot)
        assert scales[i] == pytest.approx(s)
        assert (sizes[i, 0], sizes[i, 1]) == (nh, nw)
    if have_native_loader():
        stride = max(len(d) for d in datas) + 7
        buf = np.zeros((4, stride), np.uint8)
        for i, d in enumerate(datas):
            buf[i, 3 : 3 + len(d)] = np.frombuffer(d, np.uint8)
        out2 = np.empty((4, yuv_slot_bytes(32)), np.uint8)
        sizes2 = np.zeros((4, 2), np.int32)
        scales2 = np.ones((4,), np.float32)
        fails2 = decode_letterbox_yuv_batch_view(
            buf, [3 + len(d) for d in datas], [3] * 4, 32, out2, sizes2, scales2
        )
        assert fails2 == 0
        np.testing.assert_array_equal(out2, out)
        np.testing.assert_array_equal(sizes2, sizes)


def test_yuv_batch_bad_jpeg_isolated(rng):
    """A corrupt payload yields a black slot + (0,0) size; neighbors decode."""
    from detax.serve.loader import decode_letterbox_yuv_batch

    good = _jpeg_bytes(rng, 48, 64)
    out, sizes, scales, fails = decode_letterbox_yuv_batch(
        [good, b"\xff\xd8 not a jpeg", good], 32
    )
    assert fails == 1
    assert tuple(sizes[1]) == (0, 0)
    assert (out[1, : 32 * 32] == 0).all()
    np.testing.assert_array_equal(out[0], out[2])


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
