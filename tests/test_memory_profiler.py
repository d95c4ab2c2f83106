"""Memory utilities (remat, microbatching, preflight) and profiler hooks."""

import numpy as np
import jax
import jax.numpy as jnp

from detax.memory import fits_on_device, microbatch_grads, remat
from detax.train.profiler import compile_stats, dump_hlo


def _loss(params, batch):
    x, y = batch["x"], batch["y"]
    pred = x @ params["w"]
    loss = jnp.mean((pred - y) ** 2)
    return loss, {"loss": loss}


def test_microbatch_grads_matches_full_batch(rng):
    params = {"w": jnp.asarray(rng.randn(8, 4), jnp.float32)}
    batch = {
        "x": jnp.asarray(rng.randn(16, 8), jnp.float32),
        "y": jnp.asarray(rng.randn(16, 4), jnp.float32),
    }
    (_, _), grads_full = jax.value_and_grad(_loss, has_aux=True)(params, batch)
    grad_fn = microbatch_grads(_loss, num_microbatches=4)
    (loss, _), grads_micro = jax.jit(grad_fn)(params, batch)
    np.testing.assert_allclose(
        np.asarray(grads_micro["w"]), np.asarray(grads_full["w"]), rtol=1e-5, atol=1e-6
    )


def test_remat_preserves_values_and_grads(rng):
    def f(w, x):
        return jnp.sum(jnp.tanh(x @ w) ** 2)

    w = jnp.asarray(rng.randn(6, 6), jnp.float32)
    x = jnp.asarray(rng.randn(3, 6), jnp.float32)
    g1 = jax.grad(f)(w, x)
    g2 = jax.grad(remat(f))(w, x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_fits_on_device_reports():
    fits, detail = fits_on_device(lambda x: x * 2, jnp.zeros((128, 128)))
    # CPU backend may not report limits; the call must not crash and must
    # report the requirement when analysis is available
    assert fits in (True, False, None)
    if detail:
        assert detail["required_bytes"] >= 0


def test_dump_hlo_and_compile_stats(tmp_path):
    path = str(tmp_path / "hlo.txt")
    text = dump_hlo(lambda x: x @ x, jnp.zeros((64, 64)), path=path)
    assert "fusion" in text or "dot" in text or "HloModule" in text
    with open(path) as f:
        assert f.read() == text
    stats = compile_stats(lambda x: x @ x, jnp.zeros((64, 64)))
    assert isinstance(stats, dict)
