"""Serving ENGINE ceiling: drive DetectionService directly (no HTTP).

Isolates the serving engine — native jpeg batch decode → one host->device
transfer → jitted detect → binary fan-out — from the HTTP front end and
closed-loop test clients, which share the same single core. The delta
between this number and the HTTP load test (scripts/load_test_serve.py) is
the measured front-end tax; both feed docs/serving-ceiling.md.

Run on the TPU host (no server running): python scripts/bench_serve_engine.py
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--feeders", type=int, default=2)
    ap.add_argument(
        "--outstanding", type=int, default=0,
        help="open-loop mode: submit continuously with at most this many "
        "images in flight (0 = closed-loop detect_many_jpeg feeders)",
    )
    ap.add_argument(
        "--sequential", action="store_true",
        help="single-threaded stage-timed floor: decode -> h2d -> dispatch "
        "-> fetch, no batcher/HTTP/threads — separates host CPU cost from "
        "tunnel weather",
    )
    ap.add_argument("--aot-cache", default="/tmp/detax_aot_cache")
    args = ap.parse_args()

    # 1-core host: a longer GIL switch interval keeps native (GIL-free)
    # decode sections from being preempted every 5 ms by Python threads
    sys.setswitchinterval(0.05)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from detax.cli import _build_model
    from detax.serve import aot
    from detax.serve.server import DetectionService
    from detax.structures.image_batch import ImageBatch

    model, conf = _build_model(args.image_size, args.num_classes, profile="tpu", family="frcnn")
    conf_json = json.dumps(conf.to_dict(), sort_keys=True)
    init = ImageBatch.from_pixels(jnp.zeros((1, args.image_size, args.image_size, 3)))
    init_exe, _ = aot.compile_or_load(
        args.aot_cache or None, "init|" + conf_json, model.init, jax.random.PRNGKey(0), init
    )
    params = init_exe(jax.random.PRNGKey(0), init)

    service = DetectionService(
        model, params, conf.preprocess, max_batch=args.batch, batch_timeout_ms=8.0,
        aot_cache=args.aot_cache or None, conf_json=conf_json,
    )

    if args.sequential:
        import io as _io

        from detax.serve import loader

        service.warmup()
        rng = np.random.RandomState(0)
        raw = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        yy, xx = np.mgrid[0:480, 0:640]
        img = ((np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1) + raw // 4) % 256).astype(
            np.uint8
        )
        b = _io.BytesIO()
        Image.fromarray(img).save(b, format="JPEG", quality=85)
        jpeg = b.getvalue()
        n = args.batch
        size = args.image_size
        slot = loader.yuv_slot_bytes(size)
        buf = np.empty((n, slot), np.uint8)
        fwd = service._compiled[("yuv", n)]
        stages = {"decode": [], "h2d": [], "dispatch": [], "fetch": []}
        payloads = [jpeg] * n
        t_all0 = time.time()
        nb_done = 0
        while time.time() - t_all0 < args.seconds:
            t0 = time.perf_counter()
            _, sizes, scales, fails = loader.decode_letterbox_yuv_batch(
                payloads, size, out=buf, fast_dct=True
            )
            t1 = time.perf_counter()
            dev = jnp.asarray(buf)
            t2 = time.perf_counter()
            sizes_f = np.asarray(sizes, np.float32)
            packed = fwd(params, dev, jnp.asarray(sizes_f), jnp.asarray(scales))
            t3 = time.perf_counter()
            out = np.asarray(packed)
            t4 = time.perf_counter()
            stages["decode"].append(t1 - t0)
            stages["h2d"].append(t2 - t1)
            stages["dispatch"].append(t3 - t2)
            stages["fetch"].append(t4 - t3)
            nb_done += 1
        dt = time.time() - t_all0
        med = {k: round(1e3 * float(np.median(v)), 1) for k, v in stages.items()}
        print(
            json.dumps(
                {
                    "mode": "sequential",
                    "engine_images_per_s": round(nb_done * n / dt, 1),
                    "batch": n,
                    "jpeg_kb": round(len(jpeg) / 1e3, 1),
                    "stage_median_ms": med,
                    "batches": nb_done,
                }
            )
        )
        service.stop()
        return

    service.start(warmup=True)

    rng = np.random.RandomState(0)
    raw = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:480, 0:640]
    img = ((np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1) + raw // 4) % 256).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    jpeg = buf.getvalue()

    # measure the tunnel wire rate IN this run (block_until_ready is a no-op
    # on this backend — only a host round-trip is a real barrier), because
    # the engine cap is wire_rate / slot_bytes (docs/serving-ceiling.md)
    from detax.serve import loader

    slot_b = loader.yuv_slot_bytes(args.image_size)
    big = np.empty((args.batch, slot_b), np.uint8)
    red = jax.jit(lambda x: x.astype(jnp.uint32).sum())
    float(red(jnp.asarray(np.ones((1,), np.uint8))))  # compile + warm (tiny)
    rtt = min(
        _timed(lambda: float(red(jnp.asarray(np.ones((1,), np.uint8))))) for _ in range(5)
    )
    float(red(jnp.asarray(big)))  # compile + warm (big shape)
    t_wire = min(_timed(lambda: float(red(jnp.asarray(big)))) for _ in range(5)) - rtt
    wire_mbps = big.nbytes / max(t_wire, 1e-6) / 1e6
    wire_cap = wire_mbps * 1e6 / slot_b
    print(
        f"wire: {wire_mbps:.0f} MB/s (rtt {1e3*rtt:.0f} ms) -> "
        f"engine cap ~{wire_cap:.0f} img/s at {slot_b/1e6:.2f} MB/img",
        flush=True,
    )

    # warm
    service.detect_many_jpeg([jpeg] * args.batch, binary=True)
    service.batcher.reset_stats()

    stop = time.time() + args.seconds
    counts = [0] * max(args.feeders, 1)

    if args.outstanding > 0:
        # open-loop: one submitter keeps `outstanding` images in flight, one
        # collector drains results — no closed-loop bubble where the engine
        # idles while every client waits on fan-out
        import queue

        from detax.serve.server import _BIN_MARK

        sem = threading.BoundedSemaphore(args.outstanding)
        rid_q: queue.Queue = queue.Queue()
        payload = _BIN_MARK + jpeg

        def submitter():
            while time.time() < stop:
                sem.acquire()
                rid_q.put(service.batcher.submit(payload))
            rid_q.put(None)

        def collector():
            while True:
                rid = rid_q.get()
                if rid is None:
                    return
                service.batcher.wait_result(rid)
                sem.release()
                counts[0] += 1

        ts = [threading.Thread(target=submitter), threading.Thread(target=collector)]
    else:

        def feeder(i):
            while time.time() < stop:
                service.detect_many_jpeg([jpeg] * args.batch, binary=True)
                counts[i] += args.batch

        ts = [threading.Thread(target=feeder, args=(i,)) for i in range(args.feeders)]
    t0 = time.time()
    [t.start() for t in ts]
    [t.join() for t in ts]
    dt = time.time() - t0
    s = service.stats()
    print(
        json.dumps(
            {
                "engine_images_per_s": round(sum(counts) / dt, 1),
                "batch": args.batch,
                "feeders": args.feeders if not args.outstanding else 0,
                "outstanding": args.outstanding,
                "wire_mbps": round(wire_mbps, 1),
                "wire_cap_img_s": round(wire_cap, 1),
                "jpeg_kb": round(len(jpeg) / 1e3, 1),
                "server_p50_ms": round(s["p50_ms"], 1),
                "server_p99_ms": round(s["p99_ms"], 1),
                "n": sum(counts),
            }
        )
    )
    service.stop()


if __name__ == "__main__":
    main()
