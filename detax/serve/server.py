"""Batched TPU detection service + HTTP front end.

Replaces the reference's absent Rust server (SURVEY.md §2.3) with the same
request/response *contract* a detection server needs:

  POST /detect   body = raw RGB uint8 pixels, header ``X-Image-Shape: H,W,3``
                 → JSON {"boxes": [[x1,y1,x2,y2]..], "scores": [..],
                         "classes": [..]} in original-image coordinates.
  POST /detect_batch  body = N frames of (12-byte h,w,c header + pixels)
                 concatenated (``encode_request`` framing) → JSON
                 {"results": [per-image dicts]} — one round-trip for N
                 images (throughput clients).
  GET  /stats    → JSON {"p50_ms", "p90_ms", "p99_ms", "completed",
                          "pending"} — the BASELINE "p50 request latency".

Architecture: HTTP threads submit into the native C++ batcher
(``native/batcher.cpp``) and block; a single runner thread pulls coalesced
batches, letterboxes to the static canvas, executes one jitted XLA program
(fixed batch shape — the batch is padded to ``max_batch`` so exactly one
compiled program serves all traffic), and posts results back through the
batcher, which records end-to-end latency percentiles natively.
"""

from __future__ import annotations

import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from detax.serve.batcher import DynamicBatcher

_HEADER = struct.Struct("<III")  # h, w, c

# request-payload prefix marking "respond in binary" (see encode_result_bin).
# Unambiguous against both payload kinds: JPEG starts FF D8, and raw-pixel
# framing starts with a little-endian height whose value would have to be
# 0x00425844 (≈4.3M rows) to collide.
_BIN_MARK = b"DXB\x00"
_BIN_MARK_U8 = np.frombuffer(_BIN_MARK, np.uint8)
# /detect_batch body magic for length-prefixed JPEG frames (u32 len + bytes)*
_JPEG_BATCH_MAGIC = b"DXJB"


def encode_request(image: np.ndarray) -> bytes:
    assert image.dtype == np.uint8 and image.ndim == 3
    h, w, c = image.shape
    return _HEADER.pack(h, w, c) + image.tobytes()


def encode_result_bin(boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray) -> bytes:
    """Binary result block: u32 n + boxes (n,4) f32 + scores (n,) f32 +
    classes (n,) i32, little-endian. ~150x cheaper to produce than JSON on
    the 1-core serve host (measured: scripts/probe_serve_host.py) and 3x
    smaller on the wire."""
    n = len(scores)
    return b"".join(
        [
            struct.pack("<I", n),
            np.ascontiguousarray(boxes, np.float32).tobytes(),
            np.ascontiguousarray(scores, np.float32).tobytes(),
            np.ascontiguousarray(classes, np.int32).tobytes(),
        ]
    )


def yuv_flat_to_rgb(flat, size: int):
    """Device half of the 4:2:0 wire format: (B, S*S*3/2) planar uint8 →
    (B, S, S, 3) float32 RGB in [0, 255]. Chroma 2x nearest upsample mirrors
    libjpeg do_fancy_upsampling=FALSE; BT.601 full-range matches libjpeg's
    YCbCr→RGB matrix to <1 LSB. All elementwise — XLA fuses it into the
    first conv's input normalize, so the color math is free on device."""
    import jax.numpy as jnp

    b, S = flat.shape[0], size
    y = flat[:, : S * S].reshape(b, S, S).astype(jnp.float32)
    c = flat[:, S * S :].reshape(b, S // 2, S // 2, 2).astype(jnp.float32) - 128.0
    c = jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    cb, cr = c[..., 0], c[..., 1]
    rgb = jnp.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return jnp.clip(rgb, 0.0, 255.0)


def decode_result_bin(blob: bytes, off: int = 0):
    """Inverse of encode_result_bin; returns (dict, next_offset)."""
    (n,) = struct.unpack_from("<I", blob, off)
    off += 4
    boxes = np.frombuffer(blob, np.float32, 4 * n, off).reshape(n, 4)
    off += 16 * n
    scores = np.frombuffer(blob, np.float32, n, off)
    off += 4 * n
    classes = np.frombuffer(blob, np.int32, n, off)
    off += 4 * n
    return {"boxes": boxes, "scores": scores, "classes": classes}, off


def decode_request(payload: np.ndarray | bytes) -> np.ndarray:
    buf = bytes(payload[: _HEADER.size]) if isinstance(payload, np.ndarray) else payload[: _HEADER.size]
    h, w, c = _HEADER.unpack(buf)
    raw = payload[_HEADER.size : _HEADER.size + h * w * c]
    arr = np.frombuffer(bytes(raw), np.uint8) if not isinstance(raw, np.ndarray) else raw.astype(np.uint8)
    return np.asarray(arr, np.uint8).reshape(h, w, c)


class DetectionService:
    """Owns the model, the jitted program, and the runner thread."""

    def __init__(
        self,
        model,
        params,
        preprocess_conf,
        max_batch: int = 8,
        batch_timeout_ms: float = 5.0,
        max_image_bytes: int = 1 << 22,
        aot_cache: Optional[str] = None,
        conf_json: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.pconf = preprocess_conf
        self.max_batch = max_batch
        self.batcher = DynamicBatcher(max_batch, batch_timeout_ms, item_bytes=max_image_bytes + 64)

        # device-side normalize: the host ships uint8 canvases (4x smaller
        # over the wire than f32); cast + (x-mean)/std fuse into the forward
        mean = jnp.asarray(preprocess_conf.pixel_mean, jnp.float32)
        std = jnp.asarray(preprocess_conf.pixel_std, jnp.float32)
        S = preprocess_conf.image_size

        def detect_packed(p, pixels, sizes, scales):
            from detax.structures.image_batch import ImageBatch

            norm = (pixels - mean) / std
            d = model.apply(p, ImageBatch(pixels=norm, image_sizes=sizes, scales=scales))
            # pack into ONE (B, K, 7) array: remote/tunneled backends pay a
            # round-trip per fetched array — 4 fetches ≈ 75 ms measured, 1 ≈ 25
            return jnp.concatenate(
                [
                    d.boxes,
                    d.scores[..., None],
                    d.classes.astype(jnp.float32)[..., None],
                    d.valid.astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )

        def fwd(p, u8, sizes, scales):
            return detect_packed(p, u8.astype(jnp.float32), sizes, scales)

        def fwd_yuv(p, flat, sizes, scales):
            # the fast JPEG wire format: flat (B, S*S*3/2) planar 4:2:0 —
            # HALF the host->device bytes of an RGB canvas (the measured
            # serve wire runs ~230 MB/s; see docs/serving-ceiling.md)
            return detect_packed(p, yuv_flat_to_rgb(flat, S), sizes, scales)

        self._fwd = jax.jit(fwd)
        self._fwd_fn = fwd
        self._fwd_yuv = jax.jit(fwd_yuv)
        self._fwd_yuv_fn = fwd_yuv
        # AOT executable cache (detax/serve/aot.py): warmup() fills
        # _compiled[bucket] with per-bucket compiled executables, loading
        # serialized ones from aot_cache when present — a warm restart
        # skips the multi-minute XLA compile entirely
        self.aot_cache = aot_cache
        self._conf_json = conf_json or repr(preprocess_conf)
        self._compiled: dict[int, object] = {}
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # result fan-out pool: device→host transfer + per-request JSON encode
        # happen here, NOT on the runner thread — the runner dispatches the
        # next batch while the previous one is still executing on device
        # (jax dispatch is async; the blocking np.asarray lives in the pool)
        import concurrent.futures

        self._post_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="detax-post"
        )

    @staticmethod
    def _bucket(n: int) -> int:
        """Round the live batch up to a power of two: one compiled program
        per bucket, and a lone request doesn't pay the max_batch transfer."""
        b = 1
        while b < n:
            b *= 2
        return b

    # -- client API ----------------------------------------------------------
    def detect(self, image: np.ndarray) -> dict:
        """Blocking single-image detect (thread-safe; batching happens
        underneath)."""
        rid = self.batcher.submit(encode_request(image))
        out = self.batcher.wait_result(rid)
        return json.loads(out.decode())

    def detect_many(self, images: list) -> list:
        """Blocking multi-image detect: all images are submitted up front
        (they coalesce into device batches together) and the call returns
        when every result is in. One HTTP round-trip via ``/detect_batch``
        amortizes the per-request host cost — on 1-core hosts the HTTP
        front end, not the chip, bounds per-request throughput (measured:
        artifacts/serve_load_r4.json)."""
        rids = [self.batcher.submit(encode_request(img)) for img in images]
        return [json.loads(self.batcher.wait_result(r).decode()) for r in rids]

    def detect_many_jpeg(self, jpegs: list, binary: bool = False) -> list:
        """Blocking multi-JPEG detect on the fast 4:2:0 path: one native
        batch decode, half the wire bytes, and (with ``binary=True``) raw
        ``encode_result_bin`` blobs instead of JSON dicts (decode with
        ``decode_result_bin``) — the recommended throughput API."""
        mark = _BIN_MARK if binary else b""
        rids = [self.batcher.submit(mark + j) for j in jpegs]
        outs = [self.batcher.wait_result(r) for r in rids]
        if binary:
            return [bytes(o) for o in outs]
        return [json.loads(o.decode()) for o in outs]

    def stats(self) -> dict:
        return {
            "p50_ms": self.batcher.latency_percentile_ms(50),
            "p90_ms": self.batcher.latency_percentile_ms(90),
            "p99_ms": self.batcher.latency_percentile_ms(99),
            "completed": self.batcher.completed(),
            "pending": self.batcher.pending(),
        }

    # -- runner ----------------------------------------------------------------
    def warmup(self) -> None:
        """Ready every bucket's serving program before taking traffic:
        deserialize from the AOT cache when possible, else compile (and
        serialize for the next start)."""
        import time

        import numpy as np
        import jax.numpy as jnp

        from detax.serve import aot

        size = self.pconf.image_size
        b = 1
        while b <= self.max_batch:
            t0 = time.time()
            sizes = jnp.full((b, 2), float(size), jnp.float32)
            scales = jnp.ones((b,), jnp.float32)
            for kind, fn, pix in (
                ("rgb", self._fwd_fn, jnp.zeros((b, size, size, 3), jnp.uint8)),
                ("yuv", self._fwd_yuv_fn, jnp.zeros((b, size * size * 3 // 2), jnp.uint8)),
            ):
                exe, how = aot.compile_or_load(
                    self.aot_cache, self._conf_json, fn,
                    self.params, pix, sizes, scales,
                )
                self._compiled[(kind, b)] = exe
                packed = exe(self.params, pix, sizes, scales)
                np.asarray(packed[:1, :1])  # real sync on remote backends
                print(
                    f"serve warmup: bucket {kind}:{b} ready in {time.time() - t0:.1f}s ({how})",
                    flush=True,
                )
                t0 = time.time()
            b *= 2

    def start(self, warmup: bool = True) -> None:
        assert self._thread is None
        if warmup:
            self.warmup()
        self._thread = threading.Thread(target=self._run, daemon=True, name="detax-runner")
        self._thread.start()

    def stop(self) -> None:
        # Ordering matters: wake the runner out of next_batch, join it, drain
        # every in-flight fan-out task, and only THEN destroy the native
        # handle — a pool worker calling post_result on a freed batcher is a
        # use-after-free.
        self._stop.set()
        self.batcher.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        self._post_pool.shutdown(wait=True)
        self.batcher.close()

    def _run(self) -> None:
        import collections
        import os
        import time as _time

        import jax.numpy as jnp

        from detax.serve import loader

        trace = os.environ.get("DETAX_SERVE_TRACE", "") == "1"
        size = self.pconf.image_size
        slot = loader.yuv_slot_bytes(size)
        have_native = loader.have_native_loader()
        # Per-bucket free-lists of 4:2:0 batch buffers (2 each): the runner
        # decodes batch N+1 into one while the dispatch thread serializes
        # batch N's sibling; a buffer only returns to the free-list after
        # its device transfer completes, so reuse can never race the
        # serializer. The native decoder writes every live row; pad rows
        # carry stale pixels, which is fine — their results are never
        # fanned out (ids has length n)
        yuv_free: dict[int, object] = {}

        # -- dispatch stage: device transfer + program launch ----------------
        # The host→device transfer on this tunneled backend is CPU-cheap to
        # SERIALIZE (~20 ms) but the actual wire crossing of a 19.7 MB
        # 4:2:0 batch runs at the tunnel's 50–230 MB/s — ~100–400 ms of
        # pure network time that the serve loop must hide. The wire is the
        # measured engine bound (docs/serving-ceiling.md): throughput cap =
        # wire_rate / 0.61 MB/img. Keeping the wire permanently busy needs
        # pipeline depth 3 (one decoding, one on the wire, one executing):
        # 3 buffers per bucket + queue maxsize 2 + inflight bound 3.
        import queue as _queue

        dispatch_q: _queue.Queue = _queue.Queue(maxsize=2)
        inflight = collections.deque()

        def dispatcher():
            while True:
                item = dispatch_q.get()
                if item is None:
                    return
                kind, nb2, ids2, arr, sizes2, scales2, binflags2, t_dec = item
                t_d0 = _time.perf_counter()
                fwd = self._compiled.get((kind, nb2), self._fwd_yuv if kind == "yuv" else self._fwd)
                dev = jnp.asarray(arr)
                t_d1 = _time.perf_counter()
                if kind == "yuv":  # transfer staged — the buffer is reusable
                    yuv_free[nb2].put(arr)
                packed = fwd(
                    self.params, dev, jnp.asarray(sizes2), jnp.asarray(scales2)
                )
                try:
                    # start the d2h copy the moment the program finishes, so
                    # the fan-out's np.asarray is a cheap local memcpy instead
                    # of a blocking RPC that holds the GIL for the whole
                    # device+network wait (measured: a blocking fetch starves
                    # every other thread to ~27% of its idle rate on the
                    # 1-core host; see docs/serving-ceiling.md)
                    packed.copy_to_host_async()
                except Exception:
                    pass
                if trace:
                    print(
                        f"runner n={len(ids2)} decode={1e3*t_dec:.1f} "
                        f"xfer={1e3*(t_d1-t_d0):.1f} "
                        f"launch={1e3*(_time.perf_counter()-t_d1):.1f} ms",
                        flush=True,
                    )
                inflight.append(
                    self._post_pool.submit(
                        self._post_results, ids2, packed, scales2.copy(), binflags2
                    )
                )
                while len(inflight) > 3:
                    inflight.popleft().result()

        disp_thread = threading.Thread(target=dispatcher, daemon=True, name="detax-dispatch")
        disp_thread.start()

        try:
            while not self._stop.is_set():
                ids, payloads, lens = self.batcher.next_batch_with_lens()
                if not ids:
                    if self._stop.is_set():
                        return
                    continue
                t0 = _time.perf_counter()
                n = len(ids)
                nb = self._bucket(n)

                # strip the binary-response marker, classify payload kinds
                # (vectorized: payloads is a (n, stride) uint8 matrix)
                head = payloads[:, :6]
                isbin = (head[:, :4] == _BIN_MARK_U8).all(axis=1)
                offs_a = isbin * 4
                j0 = head[np.arange(n), offs_a]
                j1 = head[np.arange(n), offs_a + 1]
                all_jpeg = bool(((j0 == 0xFF) & (j1 == 0xD8)).all())
                offs = offs_a.tolist()
                binflags = isbin.tolist()

                if all_jpeg and have_native:
                    # fast path — the recommended wire format: ONE GIL-free
                    # native call decodes the whole batch into planar 4:2:0
                    # (half the host->device bytes of RGB), one transfer, one
                    # XLA program that does chroma upsample + color + detect
                    free = yuv_free.get(nb)
                    if free is None:
                        free = yuv_free.setdefault(nb, _queue.Queue())
                        for _ in range(3):
                            free.put(np.empty((nb, slot), np.uint8))
                    buf = free.get()
                    tg = _time.perf_counter()
                    isz = np.zeros((n, 2), np.int32)
                    scales = np.ones((nb,), np.float32)
                    loader.decode_letterbox_yuv_batch_view(
                        payloads, lens, offs, size, buf, isz, scales[:n],
                        fast_dct=True,  # SIMD approx IDCT: ±1-2 LSB, ~20% less
                        # decode CPU on the 1-core host (docs/serving-ceiling.md)
                    )
                    tc = _time.perf_counter()
                    sizes = np.full((nb, 2), 1.0, np.float32)
                    sizes[:n] = isz
                    if trace:
                        print(
                            f"  decode-detail: class={1e3*(t0-t0):.1f} bufget={1e3*(tg-t0):.1f} "
                            f"cdecode={1e3*(tc-tg):.1f} ms",
                            flush=True,
                        )
                    item = ("yuv", nb, list(ids), buf, sizes, scales, binflags,
                            _time.perf_counter() - t0)
                else:
                    pixels = np.zeros((nb, size, size, 3), np.uint8)
                    sizes = np.full((nb, 2), 1.0, np.float32)
                    scales = np.ones((nb,), np.float32)
                    for i in range(n):
                        raw = payloads[i][offs[i] : lens[i]]
                        if bytes(raw[:2]) == b"\xff\xd8":  # JPEG: native decode
                            from detax.serve.loader import decode_letterbox

                            canvas, scale, nh, nw = decode_letterbox(bytes(raw), size)
                            pixels[i] = canvas
                            sizes[i] = (nh, nw)
                            scales[i] = scale
                            continue
                        img = decode_request(raw)
                        h0, w0 = img.shape[:2]
                        scale = min(size / h0, size / w0)
                        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
                        from detax.train.coco import _resize_bilinear

                        resized = (
                            _resize_bilinear(img.astype(np.float32), nh, nw).astype(np.uint8)
                            if (nh, nw) != (h0, w0)
                            else img
                        )
                        pixels[i, :nh, :nw] = resized
                        sizes[i] = (nh, nw)
                        scales[i] = scale
                    item = ("rgb", nb, list(ids), pixels, sizes, scales, binflags,
                            _time.perf_counter() - t0)

                dispatch_q.put(item)
        finally:
            dispatch_q.put(None)
            disp_thread.join(timeout=10.0)

    def _post_results(self, ids, packed, scales, binflags=None) -> None:
        try:
            import os as _os
            import time as _t

            trace = _os.environ.get("DETAX_SERVE_TRACE", "") == "1"
            t0 = _t.perf_counter()
            try:
                # wait GIL-free: is_ready() is a cheap local query and the
                # sleep fully releases the GIL, so jpeg decode / HTTP threads
                # keep the core while the device + d2h copy finish remotely
                while not packed.is_ready():
                    _t.sleep(0.002)
            except Exception:
                pass
            t1 = _t.perf_counter()
            out = np.asarray(packed)  # one host transfer: (B, K, 7)
            if trace:
                t2 = _t.perf_counter()
                print(
                    f"  post n={len(ids)} ready-wait={1e3*(t1-t0):.1f} "
                    f"fetch={1e3*(t2-t1):.1f} ms",
                    flush=True,
                )
            boxes, scores = out[..., :4], out[..., 4]
            classes = out[..., 5].astype(np.int32)
            valid = out[..., 6] > 0.5
            for i, rid in enumerate(ids):
                keep = valid[i]
                if binflags is not None and binflags[i]:
                    blob = encode_result_bin(
                        boxes[i][keep] / scales[i], scores[i][keep], classes[i][keep]
                    )
                    self.batcher.post_result(rid, blob)
                    continue
                result = {
                    "boxes": (boxes[i][keep] / scales[i]).tolist(),
                    "scores": scores[i][keep].tolist(),
                    "classes": classes[i][keep].tolist(),
                }
                self.batcher.post_result(rid, json.dumps(result).encode())
        except Exception as e:  # a lost batch must not hang its clients
            err = json.dumps({"error": f"result fan-out failed: {e}"}).encode()
            for rid in ids:
                try:
                    self.batcher.post_result(rid, err)
                except Exception:
                    pass


def serve(service: DetectionService, port: int = 8500) -> ThreadingHTTPServer:
    """Start the HTTP front end (returns the server; call serve_forever)."""

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: clients reuse connections under load instead
        # of paying a TCP handshake per request (Content-Length is set on
        # every response, which 1.1 persistence requires)
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/stats":
                body = json.dumps(service.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                # Content-Length is mandatory on EVERY response under the
                # keep-alive protocol — a length-less 404 hangs 1.1 clients
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        def do_POST(self):
            if self.path == "/stats/reset":
                service.batcher.reset_stats()
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")
                return
            if self.path == "/detect_batch":
                # body = either N raw-pixel frames (12-byte (h, w, c) header
                # + uint8 pixels, encode_request framing) concatenated, or
                # the JPEG framing b"DXJB" + (u32 len + jpeg bytes)*.
                # Response: JSON {"results": [...]} by default; with
                # Accept: application/octet-stream, u32 count + binary
                # result blocks (encode_result_bin) — the fast wire pair.
                try:
                    length = int(self.headers["Content-Length"])
                    raw = self.rfile.read(length)
                    binary = self.headers.get("Accept") == "application/octet-stream"
                    if raw[:4] == _JPEG_BATCH_MAGIC:
                        jpegs, off = [], 4
                        while off < len(raw):
                            (ln,) = struct.unpack_from("<I", raw, off)
                            jpegs.append(raw[off + 4 : off + 4 + ln])
                            off += 4 + ln
                        if not jpegs:
                            raise ValueError("empty batch")
                        results = service.detect_many_jpeg(jpegs, binary=binary)
                    else:
                        images, off = [], 0
                        while off < len(raw):
                            h, w, c = _HEADER.unpack(raw[off : off + _HEADER.size])
                            end = off + _HEADER.size + h * w * c
                            images.append(decode_request(raw[off:end]))
                            off = end
                        if not images:
                            raise ValueError("empty batch")
                        results = service.detect_many(images)
                        if binary:
                            results = [
                                encode_result_bin(
                                    np.asarray(r["boxes"], np.float32).reshape(-1, 4),
                                    np.asarray(r["scores"], np.float32),
                                    np.asarray(r["classes"], np.int32),
                                )
                                for r in results
                            ]
                    if binary:
                        blocks = [
                            r if isinstance(r, bytes) else encode_result_bin(
                                r["boxes"], r["scores"], r["classes"]
                            )
                            for r in results
                        ]
                        body = struct.pack("<I", len(blocks)) + b"".join(blocks)
                        ctype = "application/octet-stream"
                    else:
                        body = json.dumps({"results": results}).encode()
                        ctype = "application/json"
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                return
            if self.path != "/detect":
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            try:
                length = int(self.headers["Content-Length"])
                raw = self.rfile.read(length)
                binary = self.headers.get("Accept") == "application/octet-stream"
                mark = _BIN_MARK if binary else b""
                if self.headers.get("Content-Type") == "image/jpeg" or raw[:2] == b"\xff\xd8":
                    # JPEG path: ship the compressed bytes to the runner,
                    # which decodes natively (libjpeg)
                    rid = service.batcher.submit(mark + raw)
                    body = bytes(service.batcher.wait_result(rid))
                else:
                    shape = tuple(int(x) for x in self.headers["X-Image-Shape"].split(","))
                    np.frombuffer(raw, np.uint8).reshape(shape)  # validate
                    rid = service.batcher.submit(
                        mark + _HEADER.pack(*shape) + raw
                    )
                    body = bytes(service.batcher.wait_result(rid))
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "application/octet-stream" if binary else "application/json",
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # contract: errors are JSON too
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True, name="detax-http").start()
    return server
