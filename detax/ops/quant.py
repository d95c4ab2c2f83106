"""Symmetric int8 quantization: QAT fake-quant + the static serving contract.

VERDICT-r4 item 4. Round-3 measured POST-HOC int8 convs and rejected them
(`scripts/probe_int8_conv.py`: the dynamic amax prologue cost 4.7 ms and
narrow-channel convs lost outright). The remaining single-chip FLOP lever
is int8-TRAINED weights: v5e's MXU runs int8×int8→int32 at ~2× the bf16
MAC rate, and a quantization-aware-trained network serves with *static*
scales — the quantize collapses to mul+round+clip that XLA fuses into the
previous op, no amax reduction anywhere.

Three pieces:

- :func:`fake_quant_weight` / :func:`fake_quant_act` — straight-through
  fake quantization for QAT training (f32 storage, int8 numerics).
- :class:`QuantConv` — drop-in for ``flax.linen.Conv`` (same param names,
  so bf16 checkpoints load directly). ``mode='qat'`` emulates int8 numerics
  in the compute dtype; ``mode='int8'`` consumes exported int8 kernels +
  static scales and issues a real int8 conv with int32 accumulation.
- :func:`export_int8_conv` — QAT params → int8 serving params.

Usage in detax: the RetinaNet head towers (8× 3×3 256-ch convs at 97 % MFU
= the model's FLOP bulk, docs/ceiling-analysis.md §RetinaNet) behind
``RetinaNetConf.head_quant``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def weight_scale(w: Array) -> Array:
    """Per-output-channel symmetric scale for an HWIO kernel: (Co,) f32."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    return jnp.maximum(amax / 127.0, 1e-8)


def fake_quant_weight(w: Array) -> Array:
    """Straight-through per-channel int8 fake quant of an HWIO kernel."""
    s = weight_scale(w)
    wf = w.astype(jnp.float32)
    q = jnp.clip(jnp.round(wf / s), -127, 127) * s
    return (wf + jax.lax.stop_gradient(q - wf)).astype(w.dtype)


def act_scale(x: Array) -> Array:
    """Dynamic per-tensor activation scale (QAT training; the export path
    replaces it with a calibrated constant)."""
    amax = jax.lax.stop_gradient(jnp.max(jnp.abs(x.astype(jnp.float32))))
    return jnp.maximum(amax / 127.0, 1e-8)


def fake_quant_act(x: Array, scale: Array) -> Array:
    """Straight-through per-tensor int8 fake quant of an activation."""
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale), -127, 127) * scale
    return (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)


class QuantConv(nn.Module):
    """``nn.Conv`` twin with int8 quantization.

    ``mode='qat'``: params are ``kernel``/``bias`` with the SAME shapes and
    names as ``nn.Conv`` (bf16 checkpoints load unchanged); the forward
    fake-quantizes weights per-channel and activations per-tensor (dynamic
    scale) so training sees serving numerics.

    ``mode='int8'``: params are ``kernel`` int8, ``kernel_scale`` (Co,)
    f32, ``act_scale`` () f32 (from :func:`export_int8_conv`); the forward
    quantizes the input with the STATIC act scale and issues an int8×int8
    conv with ``preferred_element_type=int32`` — the v5e double-rate MXU
    path — then dequantizes into the compute dtype.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    mode: str = "qat"  # "qat" | "int8"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        ci = x.shape[-1]
        if self.mode == "qat":
            kernel = self.param("kernel", self.kernel_init, (kh, kw, ci, self.features))
            w = fake_quant_weight(kernel)
            s_x = act_scale(x)
            # calibration capture: apply with mutable=["intermediates"] and
            # reduce the sown per-batch scales with max → the static
            # act_scale that export_int8_conv bakes into the serving params
            self.sow("intermediates", "act_scale", s_x)
            xq = fake_quant_act(x, s_x)
            y = jax.lax.conv_general_dilated(
                xq.astype(self.dtype or x.dtype),
                w.astype(self.dtype or x.dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif self.mode == "int8":
            kernel = self.param(
                "kernel", nn.initializers.zeros_init(), (kh, kw, ci, self.features), jnp.int8
            )
            k_scale = self.param("kernel_scale", nn.initializers.ones, (self.features,))
            a_scale = self.param("act_scale", nn.initializers.ones, ())
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
            ).astype(jnp.int8)
            # materialize the int8 operand: without the barrier XLA fuses
            # the quantize into the conv input and loses the int8 MXU path
            # (measured: the fused form ran 10x SLOWER than bf16 while the
            # same conv with an int8 program input ran 1.36x FASTER —
            # scripts/probe_int8_static.py vs retinanet_q8 --bench r5)
            xq = jax.lax.optimization_barrier(xq)
            y32 = jax.lax.conv_general_dilated(
                xq, kernel, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y32.astype(jnp.float32) * (a_scale * k_scale)).astype(
                self.dtype or jnp.float32
            )
        else:
            raise ValueError(f"unknown quant mode {self.mode!r}")
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def export_int8_tree(params, intermediates):
    """Walk a params pytree and convert every QuantConv whose intermediates
    subtree carries sown ``act_scale`` values (one per call — shared towers
    sow once per FPN level; the max over all calls/batches is the static
    serving scale). Non-quant leaves pass through unchanged."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        sub_i = intermediates.get(k, {}) if isinstance(intermediates, dict) else {}
        if (
            isinstance(v, dict)
            and "kernel" in v
            and isinstance(sub_i, dict)
            and "act_scale" in sub_i
        ):
            scales = jnp.stack([jnp.asarray(s) for s in sub_i["act_scale"]])
            out[k] = export_int8_conv(v, jnp.max(scales))
        else:
            out[k] = export_int8_tree(v, sub_i)
    return out


def export_int8_conv(qat_params: dict, calibrated_act_scale) -> dict:
    """QAT ``{kernel, bias}`` → int8 serving ``{kernel(int8), kernel_scale,
    act_scale, bias}``. ``calibrated_act_scale`` is the activation amax/127
    captured over calibration batches (see scripts/eval_dmap_retinanet_q8)."""
    kernel = qat_params["kernel"]
    s = weight_scale(kernel)
    ki8 = jnp.clip(jnp.round(kernel.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    out = {
        "kernel": ki8,
        "kernel_scale": s,
        "act_scale": jnp.asarray(calibrated_act_scale, jnp.float32),
    }
    if "bias" in qat_params:
        out["bias"] = qat_params["bias"]
    return out
