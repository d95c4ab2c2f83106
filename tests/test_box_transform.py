import numpy as np
import jax.numpy as jnp

from detax.ops import box_transform as bt
from tests.oracles import decode_deltas, encode_deltas
from tests.test_boxes import random_boxes


def test_encode_matches_oracle(rng):
    src = random_boxes(rng, 64)
    tgt = random_boxes(rng, 64)
    got = np.asarray(bt.get_deltas(jnp.asarray(src), jnp.asarray(tgt)))
    # oracle runs in float64; fp32 log/div noise bounds the match
    np.testing.assert_allclose(got, encode_deltas(src, tgt), rtol=1e-3, atol=1e-4)


def test_encode_weights(rng):
    src = random_boxes(rng, 16)
    tgt = random_boxes(rng, 16)
    w = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(bt.get_deltas(jnp.asarray(src), jnp.asarray(tgt), weights=w))
    np.testing.assert_allclose(got, encode_deltas(src, tgt, w), rtol=1e-3, atol=1e-4)


def test_decode_matches_oracle(rng):
    boxes = random_boxes(rng, 64)
    deltas = rng.randn(64, 4).astype(np.float32)
    got = np.asarray(bt.apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, decode_deltas(deltas, boxes), rtol=1e-5, atol=1e-4)


def test_decode_clamps_large_scales(rng):
    boxes = random_boxes(rng, 4)
    deltas = np.full((4, 4), 100.0, np.float32)  # would overflow exp without clamp
    got = np.asarray(bt.apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes)))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, decode_deltas(deltas, boxes), rtol=1e-5, atol=1e-3)


def test_roundtrip(rng):
    src = random_boxes(rng, 32)
    tgt = random_boxes(rng, 32)
    deltas = bt.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    back = np.asarray(bt.apply_deltas(deltas, jnp.asarray(src)))
    np.testing.assert_allclose(back, tgt, rtol=1e-4, atol=1e-3)


def test_class_specific_deltas(rng):
    boxes = random_boxes(rng, 8)
    deltas = rng.randn(8, 3, 4).astype(np.float32)  # K=3 classes
    got = np.asarray(bt.apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes)))
    assert got.shape == (8, 3, 4)
    for k in range(3):
        np.testing.assert_allclose(got[:, k], decode_deltas(deltas[:, k], boxes), rtol=1e-5, atol=1e-4)
