"""AOT serving-startup cache: serialized compiled TPU executables.

The persistent XLA compilation cache does not work with the remote-compile
backend on this box, so a cold serve start pays the full multi-minute
detector compile every time. This module caches the *compiled PJRT
executable* instead (``jax.experimental.serialize_executable``): the first
start compiles and serializes each batch-bucket's program; later starts
deserialize and are serving in seconds.

Cache entries are keyed by a fingerprint of (jax version, backend platform
+ device kind, device count, model config JSON, program shapes) so a stale
executable is never loaded after an upgrade or config change — a mismatch
is simply a cache miss and recompiles.

The reference's analog is its TorchScript-export guards (SURVEY.md §5.1),
which were never connected to a server; here the artifact actually serves.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


_CODE_SIG: Optional[str] = None


def _code_fingerprint() -> str:
    """Digest of the detax package source — makes cache keys CODE-sensitive
    without tracing/lowering anything: a kernel or model change with an
    identical config and shapes must miss the cache (observed live: a
    pooler-kernel change silently reloaded the stale executable). Hashing
    the sources costs ~50 ms once per process vs seconds of jit tracing
    per bucket per start."""
    global _CODE_SIG
    if _CODE_SIG is None:
        import detax

        root = os.path.dirname(os.path.abspath(detax.__file__))
        h = hashlib.sha256()
        for dirpath, _, names in sorted(os.walk(root)):
            for name in sorted(names):
                if name.endswith((".py", ".cpp", ".so")):
                    p = os.path.join(dirpath, name)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _CODE_SIG = h.hexdigest()[:16]
    return _CODE_SIG


def fingerprint(conf_json: str, shapes_sig: str) -> str:
    """Stable cache key for one compiled program."""
    dev = jax.devices()[0]
    parts = [
        jax.__version__,
        dev.platform,
        getattr(dev, "device_kind", "?"),
        str(jax.device_count()),
        _code_fingerprint(),
        conf_json,
        shapes_sig,
    ]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


def save_compiled(cache_dir: str, key: str, compiled) -> Optional[str]:
    """Serialize a ``jax.stages.Compiled`` to ``cache_dir``; returns the
    path (None if the backend refuses executable serialization)."""
    from jax.experimental.serialize_executable import serialize

    try:
        blob, in_tree, out_tree = serialize(compiled)
        num_devices = len(compiled.runtime_executable().local_devices())
    except Exception:
        return None
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{key}.pjrt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        # num_devices: a 1-device program loaded on an N-device host must
        # target devices[:1], else the loader assumes an N-way sharded
        # executable ("expected args to have N shards")
        pickle.dump((blob, in_tree, out_tree, num_devices), f)
    os.replace(tmp, path)  # atomic: concurrent servers never see a torn file
    return path


def load_compiled(cache_dir: str, key: str) -> Optional[Callable]:
    """Deserialize a cached executable; None on miss or any incompatibility
    (treated as a miss — caller recompiles)."""
    from jax.experimental.serialize_executable import deserialize_and_load

    path = os.path.join(cache_dir, f"{key}.pjrt")
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            blob, in_tree, out_tree, num_devices = pickle.load(f)
        return deserialize_and_load(
            blob, in_tree, out_tree, execution_devices=jax.devices()[:num_devices]
        )
    except Exception:
        return None


def compile_or_load(
    cache_dir: Optional[str],
    conf_json: str,
    fn: Callable,
    *example_args: Any,
):
    """Returns (callable, "aot"|"compiled") for ``fn`` at the example shapes.

    With a cache dir: hit → deserialized executable (seconds); miss →
    ``jit(fn).lower().compile()`` then serialize for next time. Without a
    cache dir: plain AOT compile (still skips a warmup retrace later).
    """
    shapes_sig = ",".join(
        f"{x.dtype}{tuple(x.shape)}" for x in jax.tree_util.tree_leaves(example_args)
    )
    # fingerprint() folds in a detax source digest, so code changes miss
    # the cache WITHOUT paying a per-start trace+lower of the full model
    key = fingerprint(conf_json, shapes_sig)
    if cache_dir:
        loaded = load_compiled(cache_dir, key)
        if loaded is not None:
            return loaded, "aot"
    compiled = jax.jit(fn).lower(*example_args).compile()
    if cache_dir:
        save_compiled(cache_dir, key, compiled)
    return compiled, "compiled"
