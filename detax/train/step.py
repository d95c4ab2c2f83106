"""Jitted train / eval steps, data-parallel over a device mesh.

Design (SURVEY.md §2.4 TPU-native equivalents):
- one ``jax.jit`` with ``in_shardings``/``out_shardings``: batch arrays are
  sharded on the mesh ``data`` axis, params/opt-state replicated; XLA inserts
  the gradient all-reduce over ICI — there is no hand-written collective;
- metrics come back as a dict of scalars (device arrays) — the host loop
  feeds them to ``detax.structures.Logs`` (no host callbacks inside jit);
- a ``checkify``-style NaN guard on the total loss replaces the reference's
  ``FloatingPointError`` divergence check (``models/utils.py:81-84``): the
  step returns ``nonfinite_loss`` as a metric the host can act on.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch
from detax.train.augment import augment_batch
from detax.train.train_state import TrainState


def make_train_step(
    model,
    tx,
    mesh: Optional[Mesh] = None,
    augment: bool = True,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step for any detax model exposing
    ``train_forward(images, gt) -> (losses, metrics)``.

    Returns ``step(state, images, gt) -> (state, metrics)``. When the batch
    arrives as raw uint8 canvases (the fast feed — ``make_batches(...,
    device_normalize=True)``), normalization fuses into the step on device.
    """

    def step(state: TrainState, images: ImageBatch, gt: GroundTruth):
        if mesh is not None:
            # trace-time (static shapes): reject meshes whose spatial axis
            # outruns the deepest feature map — see mesh.validate_spatial
            from detax.dist.mesh import validate_spatial

            validate_spatial(mesh, int(images.pixels.shape[1]))
        if images.pixels.dtype == jnp.uint8:
            from detax.ops.preprocess import normalize_canvas

            images = normalize_canvas(images, model.conf.preprocess)
        rng, aug_key, sample_key = jax.random.split(state.rng, 3)
        if augment:
            images_in, gt_in = augment_batch(aug_key, images, gt)
        else:
            images_in, gt_in = images, gt

        def loss_fn(params):
            losses, metrics = model.apply(
                params,
                images_in,
                gt_in,
                method=type(model).train_forward,
                rngs={"sampling": sample_key},
            )
            total = sum(losses.values())
            return total, (losses, metrics)

        (total, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        # divergence detection: skip the update if the loss went non-finite
        ok = jnp.isfinite(total)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), params, state.params
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        out_metrics = {
            "total_loss": total,
            "nonfinite_loss": (~ok).astype(jnp.float32),
            **losses,
            **metrics,
        }
        return new_state, out_metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # state replicated; images/gt sharded on the data axis (leading dim);
    # on a (data, spatial) mesh the image H dim additionally shards on
    # ``spatial`` (conv halo exchange handled by XLA — the CNN analog of
    # context parallelism, SURVEY.md §5.7)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))
    if dict(mesh.shape).get("spatial", 1) > 1:
        pix = NamedSharding(mesh, P("data", "spatial"))
        images_shardings = ImageBatch(pixels=pix, image_sizes=batch, scales=batch)
    else:
        images_shardings = batch
    return jax.jit(
        step,
        in_shardings=(repl, images_shardings, batch),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted inference step: ``(params, images) -> Detections``."""

    def step(params, images: ImageBatch):
        return model.apply(params, images)

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, batch), out_shardings=batch)
