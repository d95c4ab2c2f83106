import numpy as np
import jax.numpy as jnp

from detax.structures import boxes as B
from tests.oracles import iou_matrix


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_area_and_centers(rng):
    b = random_boxes(rng, 32)
    got = np.asarray(B.area(jnp.asarray(b)))
    want = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    centers = np.asarray(B.get_centers(jnp.asarray(b)))
    np.testing.assert_allclose(centers, (b[:, :2] + b[:, 2:]) / 2, rtol=1e-6)


def test_pairwise_iou_matches_oracle(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 23)
    got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = iou_matrix(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_batched(rng):
    a = np.stack([random_boxes(rng, 5) for _ in range(3)])
    b = np.stack([random_boxes(rng, 7) for _ in range(3)])
    got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        np.testing.assert_allclose(got[i], iou_matrix(a[i], b[i]), rtol=1e-5, atol=1e-6)


def test_iou_safe_on_padded_zero_boxes(rng):
    a = np.zeros((4, 4), np.float32)  # degenerate padded rows
    b = random_boxes(rng, 6)
    got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(np.isfinite(got))
    assert np.all(got == 0)


def test_pairwise_ioa(rng):
    a = random_boxes(rng, 8)
    b = random_boxes(rng, 9)
    got = np.asarray(B.pairwise_ioa(jnp.asarray(a), jnp.asarray(b)))
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    want = wh[..., 0] * wh[..., 1] / area_b[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_matched_boxlist_iou(rng):
    a = random_boxes(rng, 12)
    b = random_boxes(rng, 12)
    got = np.asarray(B.matched_boxlist_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.diag(iou_matrix(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_clip_and_nonempty():
    b = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [50.0, 50.0, 200.0, 300.0], [3.0, 3.0, 3.0, 9.0]])
    clipped = B.clip(b, 100, 120)
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 10, 10], [50, 50, 120, 100], [3, 3, 3, 9]]
    )
    mask = np.asarray(B.nonempty(clipped))
    assert mask.tolist() == [True, True, False]


def test_clip_per_image_sizes():
    b = jnp.asarray(
        [
            [[0.0, 0.0, 100.0, 100.0]],
            [[0.0, 0.0, 100.0, 100.0]],
        ]
    )  # (2, 1, 4)
    clipped = B.clip(b, jnp.asarray([[50.0], [80.0]]), jnp.asarray([[60.0], [90.0]]))
    np.testing.assert_allclose(
        np.asarray(clipped), [[[0, 0, 60, 50]], [[0, 0, 90, 80]]]
    )


def test_inside_box():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [-1.0, 0.0, 10.0, 10.0], [0.0, 0.0, 100.0, 10.0]])
    mask = np.asarray(B.inside_box(b, (50, 50)))
    assert mask.tolist() == [True, False, False]
    mask2 = np.asarray(B.inside_box(b, (50, 50), boundary_threshold=100))
    assert mask2.tolist() == [True, True, True]


def test_scale(rng):
    b = random_boxes(rng, 5)
    got = np.asarray(B.scale(jnp.asarray(b), 2.0, 0.5))
    want = b * np.array([2.0, 0.5, 2.0, 0.5])
    np.testing.assert_allclose(got, want, rtol=1e-6)
