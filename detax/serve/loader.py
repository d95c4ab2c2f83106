"""ctypes bindings for the native image loader (``native/loader.cpp``).

JPEG decode + bilinear letterbox in C++ (libjpeg), GIL-free — the first-party
replacement for the reference's OpenCV/PIL native IO (``utils.py:169-174``,
``preprocessing/.../imagenet.py``). Falls back to PIL when libjpeg isn't
buildable so the framework degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdetax_loader.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "loader.cpp")
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libdetax_loader.so"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.detax_jpeg_info.restype = ctypes.c_int
            lib.detax_jpeg_info.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.detax_jpeg_decode.restype = ctypes.c_int
            lib.detax_jpeg_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.detax_jpeg_letterbox.restype = ctypes.c_int
            lib.detax_jpeg_letterbox.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.detax_jpeg_letterbox_yuv.restype = ctypes.c_int
            lib.detax_jpeg_letterbox_yuv.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.detax_jpeg_letterbox_yuv_batch.restype = ctypes.c_int
            lib.detax_jpeg_letterbox_yuv_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def have_native_loader() -> bool:
    return _load() is not None


def jpeg_info(data: bytes) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        from io import BytesIO

        from PIL import Image

        im = Image.open(BytesIO(data))
        return im.height, im.width
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.detax_jpeg_info(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        raise ValueError("not a decodable JPEG")
    return h.value, w.value


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, 3) uint8 RGB."""
    lib = _load()
    if lib is None:
        from io import BytesIO

        from PIL import Image

        return np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    h0, w0 = jpeg_info(data)
    out = np.empty((h0, w0, 3), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.detax_jpeg_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc:
        raise ValueError(f"jpeg decode failed (rc={rc})")
    return out


def decode_letterbox(data: bytes, canvas: int) -> Tuple[np.ndarray, float, int, int]:
    """JPEG bytes → zero-padded (canvas, canvas, 3) uint8 + (scale, nh, nw).

    One native pass: decode + bilinear resize into the top-left corner —
    the host half of the fused preprocessing path (the device does the
    normalize).
    """
    lib = _load()
    if lib is None:
        img = decode_jpeg(data)
        h0, w0 = img.shape[:2]
        s = min(canvas / h0, canvas / w0)
        nh, nw = min(int(round(h0 * s)), canvas), min(int(round(w0 * s)), canvas)
        from detax.train.coco import _resize_bilinear

        out = np.zeros((canvas, canvas, 3), np.uint8)
        out[:nh, :nw] = _resize_bilinear(img.astype(np.float32), nh, nw).astype(np.uint8)
        return out, s, nh, nw
    out = np.zeros((canvas, canvas, 3), np.uint8)
    scale = ctypes.c_float()
    nh, nw = ctypes.c_int(), ctypes.c_int()
    rc = lib.detax_jpeg_letterbox(
        data, len(data), canvas, out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(scale), ctypes.byref(nh), ctypes.byref(nw),
    )
    if rc:
        raise ValueError(f"jpeg letterbox failed (rc={rc})")
    return out, scale.value, nh.value, nw.value


def yuv_slot_bytes(canvas: int) -> int:
    """Bytes of one planar-4:2:0 slot: Y (S,S) then interleaved CbCr (S/2,S/2,2)."""
    return canvas * canvas * 3 // 2


def _rgb_to_yuv_slot(canvas_rgb: np.ndarray, canvas: int, nh: int, nw: int) -> np.ndarray:
    """Fallback: build the planar-4:2:0 slot from an RGB letterbox canvas
    (BT.601 full-range, the JPEG convention). Used when libjpeg is absent."""
    f = canvas_rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    half = canvas // 2
    slot = np.empty(yuv_slot_bytes(canvas), np.uint8)
    slot[: canvas * canvas] = np.clip(y + 0.5, 0, 255).astype(np.uint8).ravel()
    c = np.stack([cb, cr], -1).reshape(half, 2, half, 2, 2).mean((1, 3))
    # neutralize chroma in the padded region so padding decodes to black
    nh2, nw2 = (nh + 1) // 2, (nw + 1) // 2
    c[nh2:, :] = 128.0
    c[:, nw2:] = 128.0
    slot[canvas * canvas :] = np.clip(c + 0.5, 0, 255).astype(np.uint8).ravel()
    return slot


def decode_letterbox_yuv(
    data: bytes, canvas: int, fast_dct: bool = False
) -> Tuple[np.ndarray, float, int, int]:
    """JPEG bytes → planar-4:2:0 letterbox slot (see ``yuv_slot_bytes``) +
    (scale, nh, nw). The serve fast path: YCbCr decode skips libjpeg's color
    conversion, chroma is resized at half resolution, and the slot is HALF
    the wire bytes of an RGB canvas — the device does chroma upsample +
    YUV→RGB + normalize fused into the detection forward."""
    lib = _load()
    if lib is None:
        rgb, s, nh, nw = decode_letterbox(data, canvas)
        return _rgb_to_yuv_slot(rgb, canvas, nh, nw), s, nh, nw
    out = np.empty(yuv_slot_bytes(canvas), np.uint8)
    scale = ctypes.c_float()
    nh, nw = ctypes.c_int(), ctypes.c_int()
    rc = lib.detax_jpeg_letterbox_yuv(
        data, len(data), canvas, int(fast_dct), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(scale), ctypes.byref(nh), ctypes.byref(nw),
    )
    if rc:
        raise ValueError(f"jpeg letterbox_yuv failed (rc={rc})")
    return out, scale.value, nh.value, nw.value


def decode_letterbox_yuv_batch(
    payloads: list, canvas: int, out: Optional[np.ndarray] = None, fast_dct: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Decode a whole device batch of JPEGs in ONE GIL-free native call.

    Returns (slots (n, slot_bytes) uint8, sizes (n, 2) int32, scales (n,)
    float32, n_failures). ``out`` may be a preallocated (≥n, slot_bytes)
    buffer (the serve runner reuses one per bucket — no per-batch alloc).
    Failed decodes leave a black slot with size (0, 0).
    """
    n = len(payloads)
    slot = yuv_slot_bytes(canvas)
    if out is None:
        out = np.empty((n, slot), np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    scales = np.ones((n,), np.float32)
    lib = _load()
    if lib is None:
        fails = 0
        for i, p in enumerate(payloads):
            try:
                out[i], scales[i], sizes[i, 0], sizes[i, 1] = decode_letterbox_yuv(
                    bytes(p), canvas
                )
            except ValueError:
                out[i, : canvas * canvas] = 0
                out[i, canvas * canvas :] = 128
                fails += 1
        return out[:n], sizes, scales, fails
    bufs = [bytes(p) for p in payloads]
    datas = (ctypes.c_char_p * n)(*bufs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
    fails = lib.detax_jpeg_letterbox_yuv_batch(
        datas, lens, n, canvas, int(fast_dct), out.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out[:n], sizes, scales, fails


def decode_letterbox_yuv_batch_view(
    buf: np.ndarray,
    lens: list,
    offsets: Optional[list],
    canvas: int,
    out: np.ndarray,
    sizes: np.ndarray,
    scales: np.ndarray,
    fast_dct: bool = False,
) -> int:
    """Zero-copy batch decode: jpeg payloads live at rows of ``buf`` (the
    batcher's stride buffer); pointers are computed in place — no bytes()
    materialization. ``offsets[i]`` is an extra byte offset into row i (used
    to skip a response-format marker prefix). Requires the native lib
    (caller checks ``have_native_loader``). Returns the failure count."""
    lib = _load()
    n = len(lens)
    row = buf.strides[0]
    base = buf.ctypes.data
    offs = offsets or [0] * n
    datas = (ctypes.c_char_p * n)()
    clens = (ctypes.c_size_t * n)()
    for i in range(n):
        datas[i] = ctypes.cast(base + i * row + offs[i], ctypes.c_char_p)
        clens[i] = lens[i] - offs[i]
    return lib.detax_jpeg_letterbox_yuv_batch(
        datas, clens, n, canvas, int(fast_dct), out.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
