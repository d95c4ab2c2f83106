"""Loss primitives: smooth-L1, GIoU, BCE, focal.

Replaces the reference's fvcore imports (``smooth_l1_loss``/``giou_loss`` at
``box_regression.py:4``) and ``F.binary_cross_entropy_with_logits``
(``rpn.py:232-241``) with pure jnp functions. All losses are elementwise with
explicit masks — reductions happen at the call site so everything stays
fusable under jit and differentiable masking replaces boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def smooth_l1(pred: Array, target: Array, beta: float = 0.0) -> Array:
    """Huber-style smooth L1; ``beta == 0`` is pure L1 (the reference RPN
    default, ``config/rpn.py:130``). Elementwise."""
    diff = pred - target
    if beta <= 0.0:
        return jnp.abs(diff)
    abs_diff = jnp.abs(diff)
    return jnp.where(abs_diff < beta, 0.5 * diff * diff / beta, abs_diff - 0.5 * beta)


def giou(pred_boxes: Array, target_boxes: Array, eps: float = 1e-7) -> Array:
    """Generalized IoU loss (1 - GIoU), elementwise over ``(..., 4)`` pairs
    (fvcore ``giou_loss`` parity for the reference's ``box_reg_loss_type=
    'giou'`` option, ``box_regression.py:159-166``)."""
    px1, py1, px2, py2 = jnp.moveaxis(pred_boxes, -1, 0)
    tx1, ty1, tx2, ty2 = jnp.moveaxis(target_boxes, -1, 0)
    pred_area = (px2 - px1) * (py2 - py1)
    tgt_area = (tx2 - tx1) * (ty2 - ty1)
    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0)
    inter = iw * ih
    union = pred_area + tgt_area - inter
    iou = inter / (union + eps)
    # smallest enclosing box
    ew = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    eh = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    enclose = ew * eh
    giou_val = iou - (enclose - union) / (enclose + eps)
    return 1.0 - giou_val


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically-stable binary cross entropy with logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: Array, targets: Array, alpha: float = 0.25, gamma: float = 2.0
) -> Array:
    """RetinaNet focal loss, elementwise. ``targets`` ∈ {0, 1}."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def softmax_cross_entropy(logits: Array, labels: Array) -> Array:
    """CE with integer labels, elementwise over leading dims."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
