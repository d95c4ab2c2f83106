"""ctypes bindings for the native dynamic batcher (see ``native/batcher.cpp``).

Builds the shared library on first use (``make`` + g++; no pip deps). The
Python side never holds the GIL across a blocking wait — ctypes releases it
around foreign calls, so many HTTP threads can block in
``wait_result`` while the runner thread drives the TPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdetax_batcher.so")
_BUILD_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "batcher.cpp")
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.detax_batcher_create.restype = ctypes.c_void_p
        lib.detax_batcher_create.argtypes = [ctypes.c_size_t, ctypes.c_double]
        lib.detax_batcher_destroy.argtypes = [ctypes.c_void_p]
        lib.detax_batcher_shutdown.argtypes = [ctypes.c_void_p]
        lib.detax_batcher_submit.restype = ctypes.c_uint64
        lib.detax_batcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.detax_batcher_next_batch.restype = ctypes.c_size_t
        lib.detax_batcher_next_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.detax_batcher_next_batch2.restype = ctypes.c_size_t
        lib.detax_batcher_next_batch2.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.detax_batcher_post_result.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.detax_batcher_wait_result.restype = ctypes.c_size_t
        lib.detax_batcher_wait_result.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.detax_batcher_pending.restype = ctypes.c_size_t
        lib.detax_batcher_pending.argtypes = [ctypes.c_void_p]
        lib.detax_batcher_latency_percentile.restype = ctypes.c_double
        lib.detax_batcher_latency_percentile.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.detax_batcher_completed.restype = ctypes.c_uint64
        lib.detax_batcher_completed.argtypes = [ctypes.c_void_p]
        lib.detax_batcher_reset_stats.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class DynamicBatcher:
    """Thread-safe dynamic batching queue backed by the C++ runtime."""

    def __init__(self, max_batch: int, batch_timeout_ms: float = 5.0, item_bytes: int = 1 << 20):
        self._lib = _load_library()
        self._handle = self._lib.detax_batcher_create(max_batch, batch_timeout_ms * 1000.0)
        assert self._handle, "failed to create native batcher"
        self.max_batch = max_batch
        self.item_bytes = item_bytes
        self._closed = False

    def submit(self, payload: bytes) -> int:
        assert len(payload) <= self.item_bytes, "payload exceeds item_bytes"
        return self._lib.detax_batcher_submit(self._handle, payload, len(payload))

    def next_batch(self) -> Tuple[List[int], np.ndarray]:
        """Runner thread: block for the next batch. Returns (ids, payloads)
        where payloads is (n, item_bytes) uint8 — a view into a buffer
        reused across calls (one runner thread; consume before the next
        call). A fresh np.zeros here cost max_batch*item_bytes of memset
        per batch (128 MB at 32x4MB) on the hot path."""
        if not hasattr(self, "_batch_buf"):
            self._batch_buf = np.empty((self.max_batch, self.item_bytes), np.uint8)
            self._batch_ids = (ctypes.c_uint64 * self.max_batch)()
        ids, buf = self._batch_ids, self._batch_buf
        n = self._lib.detax_batcher_next_batch(
            self._handle, ids, buf.ctypes.data_as(ctypes.c_void_p), self.item_bytes
        )
        return list(ids[:n]), buf[:n]

    def next_batch_with_lens(self) -> Tuple[List[int], np.ndarray, List[int]]:
        """``next_batch`` + each payload's true byte length — the serve
        runner hands (pointer, len) views straight to the native jpeg batch
        decoder without copying or scanning for payload ends."""
        if not hasattr(self, "_batch_buf"):
            self._batch_buf = np.empty((self.max_batch, self.item_bytes), np.uint8)
            self._batch_ids = (ctypes.c_uint64 * self.max_batch)()
        if not hasattr(self, "_batch_lens"):
            self._batch_lens = (ctypes.c_uint64 * self.max_batch)()
        ids, buf, lens = self._batch_ids, self._batch_buf, self._batch_lens
        n = self._lib.detax_batcher_next_batch2(
            self._handle, ids, buf.ctypes.data_as(ctypes.c_void_p), self.item_bytes, lens
        )
        return list(ids[:n]), buf[:n], list(lens[:n])

    def post_result(self, request_id: int, payload: bytes) -> None:
        self._lib.detax_batcher_post_result(self._handle, request_id, payload, len(payload))

    def wait_result(self, request_id: int, max_bytes: int = 1 << 20) -> bytes:
        out = ctypes.create_string_buffer(max_bytes)
        n = self._lib.detax_batcher_wait_result(self._handle, request_id, out, max_bytes)
        return out.raw[:n]

    def pending(self) -> int:
        return self._lib.detax_batcher_pending(self._handle)

    def latency_percentile_ms(self, p: float) -> float:
        return self._lib.detax_batcher_latency_percentile(self._handle, p) / 1000.0

    def completed(self) -> int:
        return self._lib.detax_batcher_completed(self._handle)

    def reset_stats(self) -> None:
        """Clear the latency reservoir + completed counter (per-run windows)."""
        self._lib.detax_batcher_reset_stats(self._handle)

    def shutdown(self) -> None:
        """Wake all blocked next_batch/wait_result callers (they return
        empty). Safe to call before ``close``; the handle stays valid so
        in-flight post_result calls can still land."""
        if not self._closed:
            self._lib.detax_batcher_shutdown(self._handle)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._lib.detax_batcher_destroy(self._handle)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
