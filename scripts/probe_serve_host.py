"""Measure the 1-core serve host's component ceilings.

Four independent measurements that bound any serving operating point on this
host (written for VERDICT-r4 item 1 — the host-ceiling analysis mirroring
detax/train/coco.py's wire analysis):

  1. host->device wire bandwidth for uint8 canvases at serve shapes
  2. native libjpeg decode(+letterbox) rate for a typical camera JPEG
  3. Python ThreadingHTTPServer no-op request ceiling (keep-alive)
  4. per-image result encode cost: JSON vs raw binary

Prints one JSON dict.
"""

from __future__ import annotations

import io
import json
import time

import numpy as np


def measure_wire(shapes=((16, 640, 640, 3), (32, 640, 640, 3), (16, 640, 320, 3))):
    import jax

    out = {}
    for shp in shapes:
        arr = np.random.randint(0, 255, shp, np.uint8)
        # warm
        jax.device_put(arr).block_until_ready()
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 3.0:
            jax.device_put(arr).block_until_ready()
            n += 1
        dt = time.perf_counter() - t0
        mb = arr.nbytes / 1e6
        out[str(shp)] = {
            "MB": round(mb, 2),
            "xfers_per_s": round(n / dt, 2),
            "MB_per_s": round(n * mb / dt, 1),
            "imgs_per_s": round(n * shp[0] / dt, 1),
        }
    return out


def measure_decode(h=480, w=640, quality=85):
    from PIL import Image

    from detax.serve.loader import decode_letterbox

    rng = np.random.default_rng(0)
    # realistic entropy: smooth gradient + noise compresses like a photo
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy * 255 // h, xx * 255 // w, (yy + xx) * 255 // (h + w)], -1)
    img = np.clip(base + rng.integers(-20, 20, (h, w, 3)), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    payload = buf.getvalue()
    # decode+letterbox
    decode_letterbox(payload, 640)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2.0:
        decode_letterbox(payload, 640)
        n += 1
    dt = time.perf_counter() - t0
    return {
        "jpeg_kb": round(len(payload) / 1e3, 1),
        "decode_letterbox_per_s": round(n / dt, 1),
        "ms_each": round(1e3 * dt / n, 2),
    }


def measure_http_noop(n_clients=8, dur=4.0):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from http.client import HTTPConnection

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            self.rfile.read(n)
            body = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 18999), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    counts = [0] * n_clients
    stop = time.perf_counter() + dur
    payload = b"x" * 1024

    def client(i):
        c = HTTPConnection("127.0.0.1", 18999)
        while time.perf_counter() < stop:
            c.request("POST", "/detect", payload)
            c.getresponse().read()
            counts[i] += 1

    ts = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.perf_counter()
    [t.start() for t in ts]
    [t.join() for t in ts]
    dt = time.perf_counter() - t0
    srv.shutdown()
    return {"noop_rps_1kB": round(sum(counts) / dt, 1), "clients": n_clients}


def measure_encode(k=100):
    boxes = np.random.rand(k, 4).astype(np.float32) * 640
    scores = np.random.rand(k).astype(np.float32)
    classes = np.random.randint(0, 80, k)

    def enc_json():
        return json.dumps(
            {"boxes": boxes.tolist(), "scores": scores.tolist(), "classes": classes.tolist()}
        ).encode()

    def enc_bin():
        return b"".join(
            [np.int32(k).tobytes(), boxes.tobytes(), scores.tobytes(), classes.astype(np.int32).tobytes()]
        )

    out = {}
    for name, fn in [("json", enc_json), ("binary", enc_bin)]:
        fn()
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 1.0:
            fn()
            n += 1
        out[name + "_per_s"] = round(n / (time.perf_counter() - t0), 1)
    return out


if __name__ == "__main__":
    res = {
        "wire": measure_wire(),
        "decode": measure_decode(),
        "http": measure_http_noop(),
        "encode_100box": measure_encode(),
    }
    print(json.dumps(res, indent=2))
