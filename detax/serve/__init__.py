"""Batched TPU inference serving.

The reference repo's serving layer was *named but never written* ("Object
detection trained in pytorch and served in rust", reference ``README.md:2``;
zero Rust files exist — SURVEY.md §2.3). detax ships the real thing, TPU-
native: a C++ dynamic batcher (``native/batcher.cpp``, GIL-free request
coalescing + latency percentiles) under a Python HTTP front end, with one
jitted XLA program per batch shape and fused on-device preprocessing.
"""

from detax.serve.batcher import DynamicBatcher
from detax.serve.server import DetectionService, serve

__all__ = ["DynamicBatcher", "DetectionService", "serve"]
