"""Serving latency percentiles under a stated offered load (VERDICT r3 item 7).

Drives a running detax server's ``POST /detect`` with N closed-loop client
threads for a fixed duration, then records BOTH the client-side end-to-end
latency percentiles and the server's own ``GET /stats`` percentiles (the
batcher's native end-to-end accounting) into an artifact.

The BASELINE metric names "p50 request latency" (BASELINE.md); the reference
never shipped its server at all (SURVEY.md §2.3: the Rust layer is named in
README.md:2 but absent), so there is no reference number — this publishes
ours under a stated load.

Usage (server must already be running — e.g.
``python -m detax.cli serve --port 8500 --batch 32 --image-size 640``):

  python scripts/load_test_serve.py --port 8500 --clients 32 --seconds 30 \
      --height 480 --width 640 --out artifacts/serve_load_r4.json
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import threading
import time

import numpy as np


def _make_jpeg(rng, height, width, quality=85):
    # photographic-entropy JPEG payload: the server's native libjpeg
    # decode+letterbox path (smooth gradient + noise ≈ realistic size)
    import io

    from PIL import Image

    img = (rng.rand(height, width, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:height, 0:width]
    base = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1).astype(np.uint8)
    img = ((base.astype(np.int32) + img // 4) % 256).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _one_client(host, port, height, width, stop_at, lat_ms, errors, seed, per_req=1,
                jpeg=False, binary=False):
    import struct

    rng = np.random.RandomState(seed)
    img = (rng.rand(height, width, 3) * 255).astype(np.uint8)
    headers = {}
    if binary:
        headers["Accept"] = "application/octet-stream"
    if jpeg and per_req > 1:
        # the recommended throughput wire pair: DXJB-framed JPEG batch in,
        # packed binary results out — one native batch decode server-side
        jp = _make_jpeg(rng, height, width)
        path = "/detect_batch"
        body = b"DXJB" + b"".join(struct.pack("<I", len(jp)) + jp for _ in range(per_req))
    elif jpeg:
        path, body = "/detect", _make_jpeg(rng, height, width)
        headers["Content-Type"] = "image/jpeg"
    elif per_req > 1:
        from detax.serve.server import encode_request

        path, body = "/detect_batch", b"".join(encode_request(img) for _ in range(per_req))
    else:
        path, body = "/detect", img.tobytes()
        headers["X-Image-Shape"] = f"{height},{width},3"
    conn = None
    while time.time() < stop_at:
        t0 = time.time()
        try:
            if conn is None:  # keep-alive: reuse the connection across requests
                conn = http.client.HTTPConnection(host, port, timeout=300)
            conn.request("POST", path, body=body, headers=headers)
            r = conn.getresponse()
            payload = r.read()
            if r.status != 200:
                errors.append(r.status)
                continue
            if binary:
                assert len(payload) >= 4
            else:
                json.loads(payload)
            lat_ms.append((time.time() - t0) * 1000.0)
        except Exception as e:  # connection errors count against the run
            errors.append(str(e))
            try:
                conn.close()
            except Exception:
                pass
            conn = None


def _get_stats(host, port):
    c = http.client.HTTPConnection(host, port, timeout=60)
    c.request("GET", "/stats")
    return json.loads(c.getresponse().read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--warmup-seconds", type=float, default=5.0)
    ap.add_argument(
        "--images-per-request", type=int, default=1,
        help=">1 drives POST /detect_batch (amortizes the per-request host cost)",
    )
    ap.add_argument(
        "--jpeg", action="store_true",
        help="send JPEG bodies (native libjpeg decode+letterbox on the server); "
        "with --images-per-request > 1 uses the DXJB batch framing + one "
        "native batch decode per device batch",
    )
    ap.add_argument(
        "--binary", action="store_true",
        help="Accept: application/octet-stream — packed binary results",
    )
    ap.add_argument("--out", default="artifacts/serve_load_r5.json")
    args = ap.parse_args()

    # warmup (excluded from the recorded window)
    stop = time.time() + args.warmup_seconds
    warm_lat, warm_err = [], []
    ts = [
        threading.Thread(
            target=_one_client,
            args=(args.host, args.port, args.height, args.width, stop, warm_lat, warm_err, i,
                  args.images_per_request, args.jpeg, args.binary),
        )
        for i in range(args.clients)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()

    # per-run window: zero the server's latency reservoir so the published
    # server-side percentiles cover exactly this measurement window
    c = http.client.HTTPConnection(args.host, args.port, timeout=60)
    c.request("POST", "/stats/reset")
    c.getresponse().read()
    stats_before = _get_stats(args.host, args.port)
    lat_ms: list = []
    errors: list = []
    stop = time.time() + args.seconds
    t_start = time.time()
    ts = [
        threading.Thread(
            target=_one_client,
            args=(args.host, args.port, args.height, args.width, stop, lat_ms, errors, 1000 + i,
                  args.images_per_request, args.jpeg, args.binary),
        )
        for i in range(args.clients)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    elapsed = time.time() - t_start
    stats_after = _get_stats(args.host, args.port)

    lat = np.asarray(sorted(lat_ms))
    completed = int(stats_after["completed"]) - int(stats_before["completed"])
    result = {
        "offered_load": {
            "clients_closed_loop": args.clients,
            "images_per_request": args.images_per_request,
            "payload": "jpeg" if args.jpeg else "raw-uint8",
            "response": "binary" if args.binary else "json",
            "image_shape": [args.height, args.width, 3],
            "duration_s": round(elapsed, 2),
        },
        "achieved_rps": round(len(lat) / elapsed, 2),
        "achieved_images_per_s": round(len(lat) * args.images_per_request / elapsed, 2),
        "client_latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 2) if len(lat) else None,
            "p90": round(float(np.percentile(lat, 90)), 2) if len(lat) else None,
            "p99": round(float(np.percentile(lat, 99)), 2) if len(lat) else None,
            "mean": round(float(lat.mean()), 2) if len(lat) else None,
            "n": int(len(lat)),
        },
        "server_stats_after": stats_after,
        "server_completed_in_window": completed,
        "errors": len(errors),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
