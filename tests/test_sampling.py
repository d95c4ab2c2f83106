import jax
import numpy as np
import jax.numpy as jnp

from detax.ops.sampling import resample_labels, subsample_labels


def _labels(rng, n, frac_pos, frac_ignore):
    r = rng.uniform(size=n)
    labels = np.zeros(n, np.int32)
    labels[r < frac_pos] = 1
    labels[r > 1 - frac_ignore] = -1
    return labels


def test_counts_when_plenty(rng):
    labels = _labels(rng, 4096, 0.3, 0.1)
    pos, neg = subsample_labels(jax.random.PRNGKey(0), jnp.asarray(labels), 256, 0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 128 and neg.sum() == 128
    assert np.all(labels[pos] == 1)
    assert np.all(labels[neg] == 0)
    assert not np.any(pos & neg)


def test_counts_when_few_positives(rng):
    labels = np.zeros(1000, np.int32)
    labels[:10] = 1
    pos, neg = subsample_labels(jax.random.PRNGKey(1), jnp.asarray(labels), 256, 0.5)
    # all 10 positives taken, negatives fill to 256 (reference utils.py:57-66)
    assert np.asarray(pos).sum() == 10
    assert np.asarray(neg).sum() == 246


def test_counts_when_few_total(rng):
    labels = np.full(100, -1, np.int32)
    labels[:5] = 1
    labels[5:12] = 0
    pos, neg = subsample_labels(jax.random.PRNGKey(2), jnp.asarray(labels), 256, 0.5)
    assert np.asarray(pos).sum() == 5
    assert np.asarray(neg).sum() == 7


def test_randomness_is_uniform(rng):
    labels = _labels(rng, 512, 0.5, 0.0)
    counts = np.zeros(512)
    for i in range(64):
        pos, _ = subsample_labels(jax.random.PRNGKey(i), jnp.asarray(labels), 64, 0.5)
        counts += np.asarray(pos)
    picked = counts[labels == 1]
    assert picked.std() < picked.mean()  # loose uniformity sanity check
    assert np.all(counts[labels != 1] == 0)


def test_resample_labels(rng):
    labels = _labels(rng, 2048, 0.2, 0.05)
    out = np.asarray(resample_labels(jax.random.PRNGKey(3), jnp.asarray(labels), 256, 0.5))
    assert ((out == 1).sum(), (out == 0).sum()) == (128, 128)
    assert np.all(labels[out == 1] == 1)
    assert np.all(labels[out == 0] == 0)
    # everything unsampled is ignore
    assert (out != -1).sum() == 256


def test_jit_and_vmap(rng):
    labels = np.stack([_labels(rng, 512, 0.3, 0.1) for _ in range(4)])
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    fn = jax.jit(jax.vmap(lambda k, l: subsample_labels(k, l, 64, 0.25)))
    pos, neg = fn(keys, jnp.asarray(labels))
    assert np.all(np.asarray(pos).sum(-1) == 16)
    assert np.all(np.asarray(neg).sum(-1) == 48)
