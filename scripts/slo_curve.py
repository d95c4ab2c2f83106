"""Latency-SLO operating points: batch-size x batch-timeout -> p50/p99.

VERDICT-r4 item 9: the throughput operating point (big batches, closed-loop
saturation) is published in serve_load_r5.json; THIS script publishes the
low-latency end: a lone client (or a small trickle) posting single JPEGs,
against servers configured with different (max_batch, batch_timeout_ms).

Rather than restarting the CLI server per config (a full process + warmup
per point), it builds ONE DetectionService per config in-process reusing
the same params and AOT cache, drives it over real HTTP, resets stats
between points, and writes one artifact table.

Run on the TPU host:  python scripts/slo_curve.py --out artifacts/serve_slo_r5.json
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drive(port: int, jpeg: bytes, seconds: float, offered_rps: float):
    """Open-loop-ish single client: one request at a time, paced to
    offered_rps (sleeps the remainder of each period). Returns latencies."""
    lat = []
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    stop = time.time() + seconds
    period = 1.0 / offered_rps
    while time.time() < stop:
        t0 = time.time()
        conn.request(
            "POST", "/detect", body=jpeg,
            headers={"Content-Type": "image/jpeg", "Accept": "application/octet-stream"},
        )
        r = conn.getresponse()
        r.read()
        assert r.status == 200
        lat.append((time.time() - t0) * 1e3)
        rest = period - (time.time() - t0)
        if rest > 0:
            time.sleep(rest)
    return lat


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--offered-rps", type=float, default=4.0)
    ap.add_argument("--aot-cache", default="/tmp/detax_aot_cache")
    ap.add_argument("--out", default="artifacts/serve_slo_r5.json")
    args = ap.parse_args()

    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from detax.cli import _build_model
    from detax.serve import aot
    from detax.serve.server import DetectionService, serve
    from detax.structures.image_batch import ImageBatch

    model, conf = _build_model(args.image_size, args.num_classes, profile="tpu", family="frcnn")
    conf_json = json.dumps(conf.to_dict(), sort_keys=True)
    init = ImageBatch.from_pixels(jnp.zeros((1, args.image_size, args.image_size, 3)))
    init_exe, _ = aot.compile_or_load(
        args.aot_cache or None, "init|" + conf_json, model.init, jax.random.PRNGKey(0), init
    )
    params = init_exe(jax.random.PRNGKey(0), init)

    rng = np.random.RandomState(0)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:480, 0:640]
    img = ((np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1) + img // 4) % 256).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    jpeg = buf.getvalue()

    rows = []
    port = 18700
    for max_batch in (1, 4, 8):
        for timeout_ms in (0.5, 4.0, 16.0):
            service = DetectionService(
                model, params, conf.preprocess, max_batch=max_batch,
                batch_timeout_ms=timeout_ms, aot_cache=args.aot_cache or None,
                conf_json=conf_json,
            )
            service.start()  # warm (AOT-cached after the first config)
            server = serve(service, port=port)
            try:
                drive(port, jpeg, seconds=2.0, offered_rps=args.offered_rps)  # warm
                service.batcher.reset_stats()
                lat = drive(port, jpeg, args.seconds, args.offered_rps)
                s = service.stats()
                rows.append(
                    {
                        "max_batch": max_batch,
                        "batch_timeout_ms": timeout_ms,
                        "offered_rps": args.offered_rps,
                        "n": len(lat),
                        "client_p50_ms": round(float(np.percentile(lat, 50)), 1),
                        "client_p99_ms": round(float(np.percentile(lat, 99)), 1),
                        "server_p50_ms": round(s["p50_ms"], 1),
                        "server_p99_ms": round(s["p99_ms"], 1),
                    }
                )
                print(json.dumps(rows[-1]), flush=True)
            finally:
                server.shutdown()
                service.stop()
            port += 1

    out = {
        "note": (
            "low-latency operating points: one paced client posting single "
            f"{len(jpeg)//1024} KB VGA JPEGs (binary responses) against the "
            f"{args.image_size}^2 flagship; rows sweep the server's "
            "(max_batch, batch_timeout_ms). At trickle load the dominant "
            "terms are the bucket-1 program latency plus the configured "
            "coalescing timeout; pick timeout<=0.5 ms for latency SLOs and "
            "the big-batch rows only for throughput."
        ),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
