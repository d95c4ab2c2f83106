"""Train state: params + optimizer + step + RNG, with frozen-BN masking.

Replaces the reference's weights-only checkpoint contract
(``BaseModel.save/load``, ``models/base.py:47-76``) with a full functional
train state. ``frozen_bn`` statistics (see ``detax.nn.conv``) are masked out
of the optimizer so imported backbone stats stay exactly frozen, matching
standard detection fine-tune practice.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def _is_frozen(path) -> bool:
    return any(getattr(k, "key", None) == "frozen_bn" for k in path)


def frozen_bn_mask(params) -> Any:
    """True = trainable; frozen_bn subtrees are held constant."""
    return jax.tree_util.tree_map_with_path(lambda path, _: not _is_frozen(path), params)


def make_optimizer(
    learning_rate: float | Callable = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: Optional[float] = 10.0,
    params=None,
) -> optax.GradientTransformation:
    """SGD+momentum with weight decay — the standard detection recipe.

    ``params`` (optional) enables the frozen-BN mask.
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    tx = optax.chain(*chain)
    if params is not None:
        # frozen leaves get a zeroing transform (optax.masked would pass the
        # raw gradient through for masked-out leaves)
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if _is_frozen(path) else "train", params
        )
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx


def warmup_cosine_schedule(
    base_lr: float, total_steps: int, warmup_steps: int = 500
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr * 0.001,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
    )


def create_train_state(
    params,
    tx: Optional[optax.GradientTransformation] = None,
    rng: Optional[jnp.ndarray] = None,
    learning_rate: float | Callable = 0.02,
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = tx if tx is not None else make_optimizer(learning_rate, params=params)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        ),
        tx,
    )
