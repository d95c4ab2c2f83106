"""Metrics history store — the working equivalent of the reference ``Logs``.

The reference's ``Logs`` singleton (``python/src/structures/storage.py:8-194``)
keeps per-name scalar histories with iteration stamps and median smoothing for
tensorboard-style consumers; as written it cannot even construct (defect M9 in
SURVEY.md: a ``defaultdict`` built from an instance, not a factory). This is
the fixed, framework-native version.

TPU discipline: jitted steps never call into this object. Train/eval steps
return a plain ``dict[str, Array]`` of metrics from inside ``jit`` (see
``detax.train.step``); the host-side loop feeds that dict into ``Logs`` once
per step. Scalar names produced by detax match the reference's
(``rpn/num_pos_anchors``, ``rpn/num_neg_anchors`` from ``rpn.py:218-220``;
``roi_head/num_fg_samples``, ``roi_head/num_bg_samples`` from
``roi.py:189-191``).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


class HistoryBuffer:
    """Ring buffer of (value, iteration) pairs with running statistics.

    Stands in for fvcore's ``HistoryBuffer`` (imported by the reference at
    ``storage.py:6``) so detax has zero fvcore dependency.
    """

    def __init__(self, max_length: int = 1_000_000):
        self._max_length = max_length
        self._data: List[Tuple[float, float]] = []
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: Optional[float] = None) -> None:
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self) -> float:
        return self._data[-1][0]

    def median(self, window_size: int) -> float:
        vals = sorted(v for v, _ in self._data[-window_size:])
        return vals[len(vals) // 2]

    def avg(self, window_size: int) -> float:
        vals = [v for v, _ in self._data[-window_size:]]
        return sum(vals) / len(vals)

    def global_avg(self) -> float:
        return self._global_avg

    def values(self) -> List[Tuple[float, float]]:
        return self._data


class Logs:
    """Scalar/image/histogram staging area (reference ``storage.py:8-194``)."""

    def __init__(self, start_iter: int = 0, window_size: int = 20):
        self._iter = start_iter
        self._window_size = window_size
        self._histories: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self._latest: Dict[str, Tuple[float, int]] = {}
        self._smoothing_hints: Dict[str, bool] = {}
        self._images: List[Tuple[str, object, int]] = []
        self._histograms: List[Tuple[str, object, int]] = []

    # -- producers ---------------------------------------------------------
    def put_scalar(self, name: str, value, smoothing_hint: bool = True) -> None:
        value = float(value)
        self._histories[name].update(value, self._iter)
        self._latest[name] = (value, self._iter)
        existing = self._smoothing_hints.get(name)
        if existing is not None and existing != smoothing_hint:
            raise ValueError(f"Scalar {name} was put with inconsistent smoothing_hint")
        self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    def put_metrics(self, metrics: Dict[str, object]) -> None:
        """Ingest the metrics dict returned by a jitted step (device arrays ok).

        All device scalars are fetched in ONE host transfer: remote/tunneled
        backends pay a round-trip per fetched array (~25 ms measured), so
        per-metric ``float()`` would dominate small train steps.
        """
        items = list(metrics.items())
        device_idx = [i for i, (_, v) in enumerate(items) if hasattr(v, "addressable_shards")]
        if len(device_idx) > 1:
            import jax.numpy as jnp
            import numpy as np

            stacked = np.asarray(
                jnp.stack([jnp.asarray(items[i][1], jnp.float32).reshape(()) for i in device_idx])
            )
            for j, i in enumerate(device_idx):
                self.put_scalar(items[i][0], float(stacked[j]))
            for i, (k, v) in enumerate(items):
                if i not in device_idx:
                    self.put_scalar(k, float(v))
        else:
            for k, v in items:
                self.put_scalar(k, float(v))

    def put_image(self, img_name: str, img) -> None:
        self._images.append((img_name, img, self._iter))

    def put_histogram(self, hist_name: str, values) -> None:
        self._histograms.append((hist_name, values, self._iter))

    # -- consumers ----------------------------------------------------------
    def history(self, name: str) -> HistoryBuffer:
        if name not in self._histories:
            raise KeyError(f"No history metric available for {name}!")
        return self._histories[name]

    def histories(self) -> Dict[str, HistoryBuffer]:
        return dict(self._histories)

    def latest(self) -> Dict[str, Tuple[float, int]]:
        return dict(self._latest)

    def latest_with_smoothing_hint(self, window_size: Optional[int] = None):
        window_size = window_size or self._window_size
        result = {}
        for name, (value, it) in self._latest.items():
            if self._smoothing_hints.get(name, False):
                value = self._histories[name].median(window_size)
            result[name] = (value, it)
        return result

    def clear_images(self) -> None:
        self._images = []

    def clear_histograms(self) -> None:
        self._histograms = []

    def write_jsonl(self, path: str, window_size: Optional[int] = None) -> None:
        """Append the latest (smoothed) scalars as one JSON line — the
        consumer the reference never shipped (its ``Logs`` staged data for a
        tensorboard writer that doesn't exist, SURVEY.md §5.5)."""
        import json
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        row = {"iter": self._iter}
        for name, (value, _) in self.latest_with_smoothing_hint(window_size).items():
            row[name] = value
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # -- iteration bookkeeping ----------------------------------------------
    @property
    def iter(self) -> int:
        return self._iter

    def step(self) -> None:
        self._iter += 1


_GLOBAL_LOGS: Optional[Logs] = None


def get_logs() -> Logs:
    """Process-global ``Logs`` (the reference exposes a singleton the same way)."""
    global _GLOBAL_LOGS
    if _GLOBAL_LOGS is None:
        _GLOBAL_LOGS = Logs()
    return _GLOBAL_LOGS
