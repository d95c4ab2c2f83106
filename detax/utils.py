"""General utilities: IO helpers and detection visualization.

Parity with the reference's ``python/src/utils.py`` L1 tier (C31–C34 in
SURVEY.md §2.1): the algorithmic members (``subsample_labels``,
``batched_nms``, ``nonzero_tuple``, ``cat``) live in ``detax.ops`` as
mask-aware array functions; this module keeps the IO surface
(``ensure_dir``, JSON/pickle round-trips, the ``model_best`` copy, image
dump) without any GUI dependency (the reference used a blocking cv2 window,
``utils.py:169-174``).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Optional, Sequence

import numpy as np


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def save_json(obj: Any, path: str) -> None:
    ensure_dir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_pickle(obj: Any, path: str) -> None:
    ensure_dir(os.path.dirname(os.path.abspath(path)))
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def copy_as_best(path: str, best_name: str = "model_best") -> str:
    """The reference's best-checkpoint copy convention (``utils.py:163-166``)."""
    dst = os.path.join(os.path.dirname(os.path.abspath(path)), best_name)
    if os.path.isdir(path):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(path, dst)
    else:
        shutil.copyfile(path, dst)
    return dst


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: Optional[np.ndarray] = None,
    scores: Optional[np.ndarray] = None,
    thickness: int = 2,
) -> np.ndarray:
    """Draw boxes onto a uint8 HWC image (pure numpy; replaces the
    reference's cv2 ``show_image`` GUI path with an artifact you can save)."""
    out = image.copy()
    h, w = out.shape[:2]
    for i, box in enumerate(np.asarray(boxes)):
        x1, y1, x2, y2 = [int(round(float(v))) for v in box]
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        cls = int(classes[i]) if classes is not None else 0
        color = np.array(
            [(cls * 67) % 200 + 55, (cls * 127) % 200 + 55, (cls * 29) % 200 + 55], np.uint8
        )
        t = thickness
        out[y1 : y1 + t, x1:x2] = color
        out[max(y2 - t, 0) : y2, x1:x2] = color
        out[y1:y2, x1 : x1 + t] = color
        out[y1:y2, max(x2 - t, 0) : x2] = color
    return out


def save_image(image: np.ndarray, path: str) -> None:
    """Save an HWC uint8 image; PIL if present, raw .npy otherwise."""
    ensure_dir(os.path.dirname(os.path.abspath(path)))
    try:
        from PIL import Image

        Image.fromarray(image).save(path)
    except ImportError:
        np.save(path + ".npy", image)
