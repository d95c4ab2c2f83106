"""Window-DMA Pallas ROIAlign vs the gather path / numpy oracle
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from detax.ops.roi_align import assign_boxes_to_levels, multiscale_roi_align
from detax.ops.roi_align_pallas import multiscale_roi_align_pallas
from tests.oracles import roi_align_oracle


def _setup(rng, b=2, n=12, c=8, size=512):
    strides = [4, 8, 16, 32]
    feats = [
        jnp.asarray(rng.randn(b, size // s, size // s, c), np.float32) for s in strides
    ]
    xy = rng.uniform(0, size * 0.6, (b, n, 2))
    wh = rng.uniform(8, size * 0.35, (b, n, 2))
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, size)], -1), np.float32)
    return feats, boxes, strides


def test_pallas_matches_gather_path(rng):
    feats, boxes, strides = _setup(rng)
    # both paths with the same span-aware level bump (window contract)
    want = np.asarray(
        multiscale_roi_align(feats, boxes, strides, (7, 7), 2, True, max_side_cells=28)
    )
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_matches_oracle_per_level(rng):
    feats, boxes, strides = _setup(rng, b=1, n=6)
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4, max_side_cells=28))
    for j in range(6):
        l = int(lv[0, j]) - 2
        want = roi_align_oracle(
            np.asarray(feats[l][0]), np.asarray(boxes[0, j : j + 1]), 1.0 / strides[l], (7, 7), 2, True
        )
        np.testing.assert_allclose(got[0, j], want[0], rtol=1e-4, atol=1e-4)


def test_pallas_small_top_level_map(rng):
    # 640 canvas → p4 map is 20x20 < the 32 window; exercises padding
    strides = [4, 8, 16, 32]
    b, c = 1, 4
    feats = [jnp.asarray(rng.randn(b, 640 // s, 640 // s, c), np.float32) for s in strides]
    boxes = jnp.asarray([[[10.0, 10.0, 630.0, 620.0], [50.0, 40.0, 600.0, 580.0]]], np.float32)
    want = np.asarray(multiscale_roi_align(feats, boxes, strides, (7, 7), 2, True))
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_unaligned_width_right_edge_boxes(rng):
    # 800 canvas → map widths 200/100/50/25; 100, 50, 25 are NOT multiples of
    # the 8-cell DMA alignment. Without width padding to X_ALIGN the aligned
    # window's clip bound (pad_w - WIN_X) falls up to 7 cells short of the
    # right edge and edge-box taps silently clip onto the wrong column.
    strides = [4, 8, 16, 32]
    b, c, size = 1, 6, 800
    feats = [
        jnp.asarray(rng.randn(b, size // s, size // s, c), np.float32)
        for s in strides
    ]
    # right-edge-hugging boxes with areas targeting each level
    boxes = jnp.asarray(
        [[
            [size - 40.0, 100.0, size - 1.0, 140.0],   # ~level 2
            [size - 100.0, 200.0, size - 1.0, 300.0],  # ~level 3
            [size - 200.0, 100.0, size - 1.0, 300.0],  # ~level 4
            [size - 420.0, 50.0, size - 1.0, 470.0],   # ~level 5
            [size - 64.0, size - 64.0, size - 1.0, size - 1.0],  # corner
        ]],
        np.float32,
    )
    want = np.asarray(
        multiscale_roi_align(feats, boxes, strides, (7, 7), 2, True, max_side_cells=28)
    )
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_wide_channels_unpacked_path(rng):
    # c > 64 takes the unpacked (c-padded) kernel; keep it covered now that
    # the default tests (c ≤ 64) exercise the Y-pair-packed path
    feats, boxes, strides = _setup(rng, b=1, n=8, c=80)
    want = np.asarray(
        multiscale_roi_align(feats, boxes, strides, (7, 7), 2, True, max_side_cells=28)
    )
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_ratio_one(rng):
    feats, boxes, strides = _setup(rng, n=5)
    want = np.asarray(
        multiscale_roi_align(feats, boxes, strides, (7, 7), 1, True, max_side_cells=28)
    )
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_span_bump_no_effect_on_square_boxes(rng):
    # square boxes always fit the window at their canonical level, so the
    # span-aware bump must be a no-op for them
    import jax.numpy as jnp

    xy = rng.uniform(0, 300, (1, 20, 2)).astype(np.float32)
    side = rng.uniform(16, 200, (1, 20, 1)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + side, ], -1)[..., [0, 1, 2, 3]])
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + side], axis=-1)
    a = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4))
    b = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4, max_side_cells=28))
    np.testing.assert_array_equal(a, b)


def test_span_bump_extreme_aspect_goes_coarser(rng):
    import jax.numpy as jnp

    # 300x20 box: sqrt(area)=77 → canonical level 2 (stride 4) where the long
    # side would span 75 cells; the bump must push it coarser
    boxes = jnp.asarray([[[10.0, 10.0, 310.0, 30.0]]])
    a = int(np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4))[0, 0])
    b = int(np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4, max_side_cells=28))[0, 0])
    assert a == 2 and b > a
    assert 300 / (2 ** b) <= 28


def test_keep_ph_pad_rows(rng):
    # keep_ph_pad returns the kernel's native 8 pooled rows: rows 0..6 match
    # the sliced output exactly, row 7 is exactly zero (its y-weights are the
    # wy8 zero-pad row)
    feats, boxes, strides = _setup(rng, b=1, n=6)
    sliced = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2))
    padded = np.asarray(
        multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2, keep_ph_pad=True)
    )
    assert padded.shape == sliced.shape[:2] + (8,) + sliced.shape[3:]
    np.testing.assert_array_equal(padded[:, :, :7], sliced)
    np.testing.assert_array_equal(padded[:, :, 7], 0.0)


def test_pad_box_head_params_equivalence(rng):
    # a box head applied to (8, 7, C) ph-padded pooled features with
    # pad_box_head_params_for_ph_pad-transformed params reproduces the
    # standard (7, 7, C) result exactly
    import jax

    from detax.configs import FasterRCNNConf
    from detax.models.roi_heads import StandardROIHeads, pad_box_head_params_for_ph_pad

    conf = FasterRCNNConf().roi
    head = StandardROIHeads(conf=conf)
    pooled = jnp.asarray(rng.randn(3, 7, 7, 64), np.float32)
    params = head.init(jax.random.PRNGKey(0), pooled)
    scores, deltas = head.apply(params, pooled)

    pooled8 = jnp.pad(pooled, ((0, 0), (0, 1), (0, 0), (0, 0)))
    wide = pad_box_head_params_for_ph_pad(params, conf)
    scores8, deltas8 = head.apply(wide, pooled8)
    np.testing.assert_allclose(np.asarray(scores8), np.asarray(scores), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(deltas8), np.asarray(deltas), rtol=1e-6, atol=1e-6)


def test_pallas_14x14_mask_pooler_matches_gather(rng):
    """The generic packed kernel at the mask/keypoint poolers' 14×14 output
    (ph padded to the 16-row tile in-kernel) matches the gather path."""
    feats, boxes, strides = _setup(rng)
    want = np.asarray(
        multiscale_roi_align(feats, boxes, strides, (14, 14), 2, True, max_side_cells=28)
    )
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (14, 14), 2))
    assert got.shape == want.shape == (2, 12, 14, 14, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_14x14_oracle_per_level(rng):
    feats, boxes, strides = _setup(rng, b=1, n=4)
    got = np.asarray(multiscale_roi_align_pallas(feats, boxes, strides, (14, 14), 2))
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4, max_side_cells=28))
    for j in range(4):
        l = int(lv[0, j]) - 2
        want = roi_align_oracle(
            np.asarray(feats[l][0]), np.asarray(boxes[0, j : j + 1]), 1.0 / strides[l],
            (14, 14), 2, True,
        )
        np.testing.assert_allclose(got[0, j], want[0], rtol=1e-4, atol=1e-4)


def test_v8_image_resident_exact_vs_v3_bf16(rng):
    # the image-resident v8 kernel (bf16 packed default) must be
    # BIT-IDENTICAL to the v3 window-DMA kernel: same M, same matmul, the
    # windows are just sliced from a VMEM-resident composite map. r=25 is
    # deliberately not a multiple of the program size to exercise the
    # per-image box padding + output slice.
    import detax.ops.roi_align_pallas as rap

    feats, boxes, strides = _setup(rng, b=3, n=25, c=16)
    feats = [f.astype(jnp.bfloat16) for f in feats]
    try:
        assert rap.RESIDENT_V8
        for size in ((7, 7), (14, 14)):
            want = np.asarray(
                multiscale_roi_align_pallas(feats, boxes, strides, size, 2)
            ).astype(np.float32)
            rap.RESIDENT_V8 = False
            got = np.asarray(
                multiscale_roi_align_pallas(feats, boxes, strides, size, 2)
            ).astype(np.float32)
            rap.RESIDENT_V8 = True
            np.testing.assert_array_equal(got, want)
    finally:
        rap.RESIDENT_V8 = True


def test_quantized_pooler_q8_close_to_exact(rng):
    # int8 serving lever (impl="pallas_q8"): per-(level, channel) symmetric
    # int8 windows + int8 M. Not exact by construction — assert it tracks
    # the exact bf16 kernel within the quantization error budget (~2% of
    # the output range; measured 1.8% max on random features).
    feats, boxes, strides = _setup(rng, b=2, n=16, c=16)
    feats = [f.astype(jnp.bfloat16) for f in feats]
    want = np.asarray(
        multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2)
    ).astype(np.float32)
    got = np.asarray(
        multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2, quantize=True)
    ).astype(np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.03 * scale
    # and it must stay well-correlated (sanity against sign/layout bugs)
    cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert cc > 0.999


def test_pallas_pooler_custom_vjp_grads_match_gather_twin(rng):
    """The Pallas pooler is differentiable (custom VJP: kernel forward,
    gather-path backward) — VERDICT r3 item 4. Its gradients must EQUAL the
    gather path's at the kernel's window-fitting level assignment, and its
    primal must stay the kernel output."""
    import jax

    feats, boxes, strides = _setup(rng, b=1, n=6, c=8, size=256)

    def loss_pallas(fs):
        out = multiscale_roi_align_pallas(list(fs), boxes, strides, (7, 7), 2)
        return jnp.sum(out * out)

    def loss_gather(fs):
        out = multiscale_roi_align(
            list(fs), boxes, strides, (7, 7), 2, True, max_side_cells=28
        )
        return jnp.sum(out * out)

    v_p, g_p = jax.value_and_grad(loss_pallas)(tuple(feats))
    v_g, g_g = jax.value_and_grad(loss_gather)(tuple(feats))
    # primal comes from the kernel; the two paths agree to fp tolerance
    np.testing.assert_allclose(float(v_p), float(v_g), rtol=1e-4)
    for a, b in zip(g_p, g_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pallas_pooler_vjp_keep_ph_pad_and_boxes_grad(rng):
    """keep_ph_pad: the padded row's cotangent is dropped exactly; box
    gradients flow (they are stop_gradient'd upstream in training, but the
    VJP itself must be complete)."""
    import jax

    feats, boxes, strides = _setup(rng, b=1, n=4, c=8, size=256)

    def loss(fs, bx):
        out = multiscale_roi_align_pallas(
            list(fs), bx, strides, (7, 7), 2, keep_ph_pad=True
        )
        assert out.shape[2] == 8
        return jnp.sum(out * out)

    (gf, gb) = jax.grad(loss, argnums=(0, 1))(tuple(feats), boxes)

    def loss_gather(fs, bx):
        out = multiscale_roi_align(
            list(fs), bx, strides, (7, 7), 2, True, max_side_cells=28
        )
        return jnp.sum(out * out)

    wf, wb = jax.grad(loss_gather, argnums=(0, 1))(tuple(feats), boxes)
    for a, b in zip(gf, wf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb), rtol=1e-4, atol=1e-4)
