"""AOT executable cache (detax/serve/aot.py): serialize a compiled program,
reload it from disk, and verify it computes identically — the mechanism that
cuts the serve cold start from minutes to seconds (round-3 measured:
143 s → 13.3 s warmup at image-size 128, batch buckets 1+2)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detax.serve import aot


def _fn(p, x):
    return jnp.tanh(x @ p["w"]) + p["b"]


@pytest.fixture
def example():
    p = {"w": jnp.ones((16, 16), jnp.float32) * 0.1, "b": jnp.ones((16,), jnp.float32)}
    x = jnp.linspace(-1, 1, 8 * 16, dtype=jnp.float32).reshape(8, 16)
    return p, x


def test_compile_then_cache_hit(tmp_path, example):
    p, x = example
    cache = str(tmp_path)
    exe1, how1 = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how1 == "compiled"
    exe2, how2 = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how2 == "aot", "second load must hit the serialized executable"
    np.testing.assert_array_equal(np.asarray(exe1(p, x)), np.asarray(exe2(p, x)))
    np.testing.assert_allclose(
        np.asarray(exe2(p, x)), np.tanh(np.asarray(x) @ np.asarray(p["w"])) + 1.0,
        rtol=1e-6,
    )


def test_conf_change_is_a_miss(tmp_path, example):
    p, x = example
    cache = str(tmp_path)
    _, how1 = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    _, how2 = aot.compile_or_load(cache, "conf-B", _fn, p, x)
    assert how2 == "compiled", "different config JSON must not reuse the executable"


def test_shape_change_is_a_miss(tmp_path, example):
    p, x = example
    cache = str(tmp_path)
    aot.compile_or_load(cache, "conf-A", _fn, p, x)
    x2 = jnp.concatenate([x, x])  # (16, 16)
    exe, how = aot.compile_or_load(cache, "conf-A", _fn, p, x2)
    assert how == "compiled"
    assert np.asarray(exe(p, x2)).shape == (16, 16)


def test_corrupt_cache_entry_recompiles(tmp_path, example):
    p, x = example
    cache = str(tmp_path)
    aot.compile_or_load(cache, "conf-A", _fn, p, x)
    for f in tmp_path.glob("*.pjrt"):
        f.write_bytes(b"garbage")
    exe, how = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how == "compiled"
    np.testing.assert_allclose(
        np.asarray(exe(p, x)), np.tanh(np.asarray(x) @ np.asarray(p["w"])) + 1.0,
        rtol=1e-6,
    )


def test_code_change_is_a_miss(tmp_path, example, monkeypatch):
    # same config string, same shapes, DIFFERENT detax sources must miss:
    # before round-3's code-sensitive key a kernel/model change silently
    # reloaded the stale pre-change executable (observed live with the v8
    # pooler). The key folds in a package-source digest (computed once per
    # process, no per-start tracing) — simulate an edit by forcing it.
    p, x = example
    cache = str(tmp_path)
    _, how1 = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how1 == "compiled"
    _, how1b = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how1b == "aot"

    monkeypatch.setattr(aot, "_CODE_SIG", "deadbeefdeadbeef")
    exe2, how2 = aot.compile_or_load(cache, "conf-A", _fn, p, x)
    assert how2 == "compiled", "changed sources with identical conf must recompile"
    np.testing.assert_allclose(
        np.asarray(exe2(p, x)), np.tanh(np.asarray(x) @ np.asarray(p["w"])) + 1.0,
        rtol=1e-6,
    )
