"""Probe: STATIC-scale int8 convs (the QAT serving contract) vs bf16.

VERDICT-r4 item 4. Round-3's `probe_int8_conv.py` rejected POST-HOC int8:
the dynamic amax prologue cost 4.7 ms and stage-1/2 lost outright. A
quantization-aware-trained network changes the contract: weight scales are
per-channel constants and activation scales are trained constants, so the
serving-time quantize is a multiply+round+clip that XLA fuses into the
previous op — no amax reduction anywhere. This probe measures that exact
contract at the flagship/RetinaNet hot shapes:

  bf16:        y = conv_bf16(x, w)
  static int8: y = conv_i8(q(x; s_x), w_i8) * (s_x * s_w)   [dequant fused]

and a 2-layer tower variant where the quantize of layer 2 fuses into the
dequant+relu epilogue of layer 1 (the steady-state cost inside a QAT
backbone/head — per-layer, not per-network).

Run on TPU: python scripts/probe_int8_static.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        s = fn(*args)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, dtype_out=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype_out,
    )


# (tag, B, H, W, Cin, Cout, K) — flagship + RetinaNet-head hot convs
SHAPES = [
    ("r18-stage3", 128, 40, 40, 256, 256, 3),
    ("r18-stage4", 128, 20, 20, 512, 512, 3),
    ("retina-head-P3", 128, 80, 80, 256, 256, 3),
    ("retina-head-P4", 128, 40, 40, 256, 256, 3),
    ("fpn-lateral-512", 128, 20, 20, 512, 256, 1),
]


def main():
    key = jax.random.PRNGKey(0)
    rows = []
    print(f"{'shape':20s} {'bf16':>8s} {'i8-steady':>10s} {'i8-edge':>8s} {'steady x':>8s}")
    for tag, b, h, w, ci, co, k in SHAPES:
        x = jax.random.normal(key, (b, h, w, ci), jnp.bfloat16)
        wt = jax.random.normal(key, (k, k, ci, co), jnp.bfloat16)
        # pre-quantized weights (per-tensor scale is enough for a timing probe)
        s_w = 127.0 / 4.0
        wi = jnp.clip(jnp.round(wt.astype(jnp.float32) * s_w), -127, 127).astype(jnp.int8)
        s_x = 127.0 / 4.0

        f_bf = jax.jit(lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32)))
        t_bf = bench(f_bf, x, wt)

        # steady-state: input ALREADY int8 (the previous QAT layer emitted
        # it); epilogue = dequant + relu + requant for the next layer.
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) * s_x), -127, 127).astype(jnp.int8)

        def f_steady(xq, wq):
            y = conv(xq, wq, jnp.int32).astype(jnp.float32) * (1.0 / (s_x * s_w))
            y = jax.nn.relu(y)
            yq = jnp.clip(jnp.round(y * s_x), -127, 127).astype(jnp.int8)
            return jnp.sum(yq.astype(jnp.float32))

        t_steady = bench(jax.jit(f_steady), xi, wi)

        # edge: bf16 input, static quantize (mul+round+clip, no amax), conv,
        # dequant — the one-off cost of entering the int8 region.
        def f_edge(xb, wq):
            xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * s_x), -127, 127).astype(jnp.int8)
            y = conv(xq, wq, jnp.int32).astype(jnp.float32) * (1.0 / (s_x * s_w))
            return jnp.sum(y)

        t_edge = bench(jax.jit(f_edge), x, wi)
        rows.append(
            {"shape": tag, "bf16_ms": round(t_bf, 2), "i8_steady_ms": round(t_steady, 2),
             "i8_edge_ms": round(t_edge, 2), "steady_speedup": round(t_bf / t_steady, 2)}
        )
        print(f"{tag:20s} {t_bf:8.2f} {t_steady:10.2f} {t_edge:8.2f} {t_bf/t_steady:8.2f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
