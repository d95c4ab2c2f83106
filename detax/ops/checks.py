"""Runtime validation under jit — the sanitizer tier (SURVEY.md §5.2).

The reference's only runtime guards are eager asserts (finite-check before
in-place clip, ``boxes.py:60``) and a ``FloatingPointError`` on NaN proposals
(``models/utils.py:81-84``) — both impossible under ``jax.jit``. detax uses
``jax.experimental.checkify`` so the same invariants are checkable *inside*
compiled programs, plus mask-aware pytree validators for the fixed-capacity
structures.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from detax.structures.detections import Detections, GroundTruth


def check_detections(dets: Detections) -> None:
    """checkify assertions: valid detections are finite, ordered boxes."""
    m = dets.valid
    boxes = jnp.where(m[..., None], dets.boxes, 0.0)
    checkify.check(jnp.all(jnp.isfinite(boxes)), "non-finite box coordinates")
    checkify.check(
        jnp.all(jnp.where(m, dets.boxes[..., 2] >= dets.boxes[..., 0], True)),
        "box x2 < x1",
    )
    checkify.check(
        jnp.all(jnp.where(m, dets.boxes[..., 3] >= dets.boxes[..., 1], True)),
        "box y2 < y1",
    )
    checkify.check(
        jnp.all(jnp.where(m, jnp.isfinite(dets.scores), True)), "non-finite score"
    )


def check_ground_truth(gt: GroundTruth, num_classes: int) -> None:
    m = gt.valid
    checkify.check(
        jnp.all(jnp.where(m, (gt.classes >= 0) & (gt.classes < num_classes), True)),
        "gt class out of range",
    )
    boxes = jnp.where(m[..., None], gt.boxes, 0.0)
    checkify.check(jnp.all(jnp.isfinite(boxes)), "non-finite gt box")


def checked(fn: Callable, *check_args) -> Callable:
    """Wrap a jittable fn with checkify error plumbing.

    Returns ``wrapped(*args) -> (error, out)``; raise with
    ``error.throw()`` host-side. NaN/div/OOB checks are enabled along with
    explicit ``checkify.check`` calls.
    """
    return checkify.checkify(
        fn, errors=checkify.user_checks | checkify.float_checks | checkify.index_checks
    )
