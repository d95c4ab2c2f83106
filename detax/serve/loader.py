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
