"""Model export: serialized, runtime-independent inference artifacts.

The reference sprinkles TorchScript guards everywhere so the model could one
day be exported for the (absent) Rust server (SURVEY.md §5.1). The TPU
equivalent is ``jax.export``: the jitted inference function serializes to a
StableHLO artifact that any XLA runtime (PJRT C API, IFRT server) can load
without Python or detax installed — the real serving hand-off.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def export_inference(fn: Callable, *example_args, path: str | None = None) -> bytes:
    """Serialize ``jit(fn)`` at the example shapes to a StableHLO artifact.

    Returns the serialized bytes (and writes them to ``path`` if given).
    """
    exported = jax.export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path: bytes | str):
    """Deserialize an exported artifact; returns an object whose ``.call``
    runs the compiled computation on the current backend."""
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    return jax.export.deserialize(blob)


def stablehlo_text(fn: Callable, *example_args) -> str:
    """Human-readable StableHLO of the inference program (debug/audit)."""
    return str(jax.export.export(jax.jit(fn))(*example_args).mlir_module())
