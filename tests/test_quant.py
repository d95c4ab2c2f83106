"""int8 QAT contract (detax.ops.quant): STE grads, bf16-checkpoint param
compatibility, and QAT→int8 export parity."""

import numpy as np
import jax
import jax.numpy as jnp

from detax.ops.quant import QuantConv, export_int8_conv, fake_quant_weight


def test_fake_quant_weight_ste_grad():
    w = jnp.asarray(np.random.RandomState(0).randn(3, 3, 4, 8), jnp.float32)

    def loss(w):
        return jnp.sum(fake_quant_weight(w) ** 2)

    g = jax.grad(loss)(w)
    # straight-through: gradient flows (≈ 2*q, not zero) through the round
    assert float(jnp.abs(g).max()) > 0.1
    # quantized values live on the per-channel grid
    q = fake_quant_weight(w)
    from detax.ops.quant import weight_scale

    s = weight_scale(w)
    steps = np.asarray(q / s)
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)


def test_quantconv_qat_matches_nn_conv_params():
    """QAT mode shares nn.Conv's param names/shapes: bf16 checkpoints load."""
    import flax.linen as nn

    x = jnp.ones((1, 8, 8, 4))
    ref = nn.Conv(8, (3, 3), padding="SAME").init(jax.random.PRNGKey(0), x)["params"]
    qat = QuantConv(8, (3, 3), mode="qat").init(jax.random.PRNGKey(0), x)["params"]
    assert set(ref) == set(qat) == {"kernel", "bias"}
    assert ref["kernel"].shape == qat["kernel"].shape
    assert ref["bias"].shape == qat["bias"].shape


def test_export_int8_parity():
    """int8 serving forward ≈ QAT fake-quant forward for the same scales."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 16) * 2.0, jnp.float32)
    m_qat = QuantConv(8, (3, 3), mode="qat")
    params = m_qat.init(jax.random.PRNGKey(0), x)["params"]

    y_qat, state = m_qat.apply({"params": params}, x, mutable=["intermediates"])
    (a_scale,) = state["intermediates"]["act_scale"]

    i8_params = export_int8_conv(params, a_scale)
    assert i8_params["kernel"].dtype == jnp.int8
    m_i8 = QuantConv(8, (3, 3), mode="int8")
    y_i8 = m_i8.apply({"params": i8_params}, x)

    # same numerics up to f32 accumulation order
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_i8), rtol=2e-2, atol=2e-2)


def test_export_int8_tree_roundtrip():
    """Whole-head QAT → int8 export: the int8 head runs and tracks QAT."""
    from detax.nn.retina_head import RetinaNetHead
    from detax.ops.quant import export_int8_tree

    feats = [jnp.ones((1, 8, 8, 32)) * 0.5, jnp.ones((1, 4, 4, 32)) * 0.5]
    qat = RetinaNetHead(num_classes=4, num_anchors=3, num_convs=2, quant="qat")
    p = qat.init(jax.random.PRNGKey(0), feats)["params"]
    (lq, dq), state = qat.apply({"params": p}, feats, mutable=["intermediates"])
    p_i8 = export_int8_tree(p, state["intermediates"])
    assert p_i8["cls_conv0"]["kernel"].dtype == jnp.int8
    # predictors stay bf16/f32 convs
    assert "kernel_scale" not in p_i8["cls_score"]
    i8 = RetinaNetHead(num_classes=4, num_anchors=3, num_convs=2, quant="int8")
    li, di = i8.apply({"params": p_i8}, feats)
    np.testing.assert_allclose(
        np.asarray(lq[0], np.float32), np.asarray(li[0], np.float32), rtol=0.1, atol=0.1
    )


def test_retina_head_quant_modes():
    """The head builds and runs in qat mode; bf16 params load into it."""
    from detax.nn.retina_head import RetinaNetHead

    feats = [jnp.ones((1, 8, 8, 32)), jnp.ones((1, 4, 4, 32))]
    bf = RetinaNetHead(num_classes=4, num_anchors=3, num_convs=2, quant=None)
    p_bf = bf.init(jax.random.PRNGKey(0), feats)["params"]
    qat = RetinaNetHead(num_classes=4, num_anchors=3, num_convs=2, quant="qat")
    p_qat = qat.init(jax.random.PRNGKey(0), feats)["params"]
    assert jax.tree_util.tree_structure(p_bf) == jax.tree_util.tree_structure(p_qat)
    # bf16-trained params run under qat numerics directly
    logits, deltas = qat.apply({"params": p_bf}, feats)
    assert logits[0].shape == (1, 8 * 8 * 3, 4) and deltas[1].shape == (1, 4 * 4 * 3, 4)
    assert np.isfinite(np.asarray(logits[0])).all()
