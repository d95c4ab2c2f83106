"""Random fg/bg label subsampling with static shapes.

TPU-native rewrite of the reference ``subsample_labels``
(``python/src/utils.py:34-76``, shared by RPN ``rpn.py:108-130`` and ROI heads
``roi.py:68-105``): the reference draws ``randperm`` prefixes of the positive
and negative index sets; under jit those sets have data-dependent sizes, so
detax instead samples by ranking random priorities with ``top_k`` and
comparing ranks against the (traced) sample quotas — same distribution
(uniform subsets without replacement), fully static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _sample_mask(key: Array, eligible: Array, quota: Array) -> Array:
    """Uniformly choose ``quota`` (traced) of the eligible entries.

    Returns a bool mask. Works on a flat ``(N,)`` eligibility mask.
    """
    n = eligible.shape[-1]
    priority = jax.random.uniform(key, (n,))
    priority = jnp.where(eligible, priority, -1.0)
    # Rank entries by priority: rank[i] = position of i in descending order.
    order = jnp.argsort(-priority)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return eligible & (ranks < quota)


def subsample_labels(
    key: Array,
    labels: Array,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[Array, Array]:
    """Sample at most ``num_samples`` entries, with at most
    ``positive_fraction * num_samples`` positives; negatives fill the rest.

    Args:
      key: PRNG key.
      labels: ``(N,)`` int array; ``-1`` = ignore, ``bg_label`` = negative,
        anything else = positive (reference ``utils.py:52-55``).
      num_samples / positive_fraction: quotas (reference defaults: RPN 256 @
        0.5, ROI 512 @ 0.25).

    Returns:
      ``(pos_mask, neg_mask)``: bool ``(N,)`` masks of the sampled positives /
      negatives. Counts equal ``min(#pos, pos_quota)`` and
      ``min(#neg, num_samples - num_pos)`` exactly as the reference computes
      them (``utils.py:57-66``).
    """
    kp, kn = jax.random.split(key)
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    num_pos_quota = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive), num_pos_quota)
    num_neg = jnp.minimum(jnp.sum(negative), num_samples - num_pos)

    pos_mask = _sample_mask(kp, positive, num_pos)
    neg_mask = _sample_mask(kn, negative, num_neg)
    return pos_mask, neg_mask


def resample_labels(
    key: Array,
    labels: Array,
    num_samples: int,
    positive_fraction: float,
) -> Array:
    """The RPN's ``_subsample_labels`` (reference ``rpn.py:108-130``):
    return a copy of ``labels`` where everything not sampled is set to -1
    (ignore) and sampled entries keep their 0/1 label."""
    pos_mask, neg_mask = subsample_labels(key, labels, num_samples, positive_fraction)
    out = jnp.full_like(labels, -1)
    out = jnp.where(pos_mask, jnp.ones_like(labels), out)
    out = jnp.where(neg_mask, jnp.zeros_like(labels), out)
    return out
