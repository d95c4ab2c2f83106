"""Memory management: rematerialization + microbatching.

The reference's only memory mechanism is ``retry_if_cuda_oom``
(``python/src/memory.py:26-84``): catch CUDA OOM at runtime, empty the cache,
retry, then retry on CPU. On TPU with static shapes, memory is a
*compile-time* property — the equivalents are ahead-of-time:

- :func:`remat` — ``jax.checkpoint`` wrappers trading FLOPs for activation
  memory (apply to backbone stages of large-batch training);
- :func:`microbatch_grads` — accumulate gradients over microbatches inside
  one jit via ``lax.scan``, dividing activation memory by the microbatch
  factor with identical results (the principled replacement for "retry with
  smaller memory");
- :func:`fits_on_device` — pre-flight check of a jitted program's memory
  against the device's HBM, so the OOM is a readable message before launch,
  not a runtime crash.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# Save only MXU outputs; recompute elementwise chains. The standard
# detection-backbone policy: conv outputs are the expensive thing.
DOTS_POLICY = jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims


def remat(fn: Callable, policy=None) -> Callable:
    """``jax.checkpoint`` with a TPU-appropriate default policy."""
    return jax.checkpoint(fn, policy=policy or DOTS_POLICY)


def microbatch_grads(
    loss_fn: Callable,
    num_microbatches: int,
) -> Callable:
    """Turn ``loss_fn(params, batch) -> (loss, aux)`` into a gradient function
    that scans over ``num_microbatches`` slices of the leading batch dim and
    averages gradients — one XLA program, 1/num_microbatches the activation
    memory.

    The batch size must divide ``num_microbatches``.
    """

    def grad_fn(params, batch):
        def reshape(x):
            b = x.shape[0]
            assert b % num_microbatches == 0, (
                f"batch {b} not divisible by {num_microbatches} microbatches"
            )
            return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])

        micro = jax.tree_util.tree_map(reshape, batch)
        vg = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, mb):
            (loss_sum, grads_sum) = carry
            (loss, aux), grads = vg(params, mb)
            return (
                loss_sum + loss,
                jax.tree_util.tree_map(jnp.add, grads_sum, grads),
            ), aux

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss_sum, grads_sum), auxs = jax.lax.scan(body, (0.0, zero_grads), micro)
        scale = 1.0 / num_microbatches
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads_sum)
        return (loss_sum * scale, auxs), grads

    return grad_fn


def device_memory_bytes(device: Optional[jax.Device] = None) -> Optional[int]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if stats:
        return stats.get("bytes_limit")
    return None


def fits_on_device(fn: Callable, *example_args, device=None, **example_kwargs):
    """Compile ``fn`` and compare its memory demand against device HBM.

    Returns ``(fits: Optional[bool], detail: dict)`` — ``None`` when the
    backend doesn't report limits (e.g. CPU).
    """
    compiled = jax.jit(fn).lower(*example_args, **example_kwargs).compile()
    try:
        mem = compiled.memory_analysis()
        need = (
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
        )
    except Exception:
        return None, {}
    limit = device_memory_bytes(device)
    detail = {"required_bytes": int(need), "limit_bytes": limit}
    if limit is None:
        return None, detail
    return need <= limit, detail
