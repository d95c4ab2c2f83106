"""Vectorized proposal↔GT matcher.

TPU-native rewrite of the reference ``Matcher``
(``python/src/models/components/matcher.py:7-120``): the per-threshold Python
loop and the two-pass ``nonzero`` low-quality rescue become pure array ops
that ``vmap`` over the batch. Padded GT rows are handled with a validity mask
instead of the reference's dynamic empty-matrix early-exit
(``matcher.py:68-78``) — with zero valid GTs every prediction gets
``labels[0]`` and match index 0, exactly the reference's empty-case contract.

Semantics preserved:
- ``matched_idx[n] = argmax_m quality[m, n]`` (ties → lowest index, same as
  ``torch.max``).
- labels stratified by ``thresholds`` into ``labels`` buckets
  (half-open ``[low, high)`` intervals, ``matcher.py:88-91``).
- low-quality rescue (Faster R-CNN §3.1.2 case i): every prediction achieving
  a GT's row-max quality (ties included) is force-labeled 1
  (``set_low_quality_matches_``, ``matcher.py:96-120``). Like the reference
  (which relies on qualities being positive for ``nonzero``), rescue only
  applies where the row-max is > 0; padded GT rows never rescue.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from jax import Array


def match(
    quality: Array,
    gt_valid: Array,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = True,
) -> Tuple[Array, Array]:
    """Assign each of N predictions to one of M (padded) ground truths.

    Args:
      quality: ``(..., M, N)`` match quality (e.g. pairwise IoU), >= 0.
      gt_valid: ``(..., M)`` bool mask of real GT rows.
      thresholds: ascending positive thresholds (e.g. ``[0.3, 0.7]``).
      labels: per-bucket labels in {-1, 0, 1}, ``len == len(thresholds) + 1``.

    Returns:
      ``(matched_idx, match_labels)``: ``(..., N)`` int32 GT indices and
      ``(..., N)`` int8 labels (1 fg / 0 bg / -1 ignore).
    """
    thresholds = list(thresholds)
    labels = list(labels)
    assert len(labels) == len(thresholds) + 1
    assert all(t > 0 for t in thresholds), "thresholds must be positive (reference matcher.py:31)"
    assert all(l in (-1, 0, 1) for l in labels)

    # Mask padded GT rows to quality 0 so they can win an argmax only when no
    # real GT overlaps at all — in which case matched_vals == 0 falls in the
    # lowest bucket (labels[0]) just like the reference's no-gt early exit.
    q = jnp.where(gt_valid[..., :, None], quality, 0.0)

    matched_vals = jnp.max(q, axis=-2)
    matched_idx = jnp.argmax(q, axis=-2).astype(jnp.int32)

    match_labels = jnp.full(matched_vals.shape, labels[-1], jnp.int8)
    bounds = [-jnp.inf] + thresholds + [jnp.inf]
    for label, low, high in zip(labels, bounds[:-1], bounds[1:]):
        in_bucket = (matched_vals >= low) & (matched_vals < high)
        match_labels = jnp.where(in_bucket, jnp.int8(label), match_labels)

    if allow_low_quality_matches:
        # Row max per GT over predictions; rescue ties, only for valid GTs
        # with positive max quality.
        row_max = jnp.max(q, axis=-1, keepdims=True)
        rescue = (q == row_max) & (row_max > 0) & gt_valid[..., :, None]
        rescued_pred = jnp.any(rescue, axis=-2)
        match_labels = jnp.where(rescued_pred, jnp.int8(1), match_labels)

    return matched_idx, match_labels
