"""Probe: does an int8 conv beat bf16 on this chip at detax's hot shapes?

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 MACs/cycle; whether XLA
actually lowers lax.conv with int8 operands onto that path (vs upcasting)
decides if a quantized serving backbone is worth building. Each timed
program reduces to a scalar inside jit (repo bench idiom — materializing
outputs would measure the tunnel, not the chip).

Run on TPU: python scripts/probe_int8_conv.py
"""

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


# (B, H, W, Cin, Cout, K) — flagship hot convs at b128/640²
SHAPES = [
    (128, 160, 160, 64, 64, 3),    # R18 stage-1 body 3x3
    (128, 80, 80, 128, 128, 3),    # stage-2
    (128, 40, 40, 256, 256, 3),    # stage-3
    (128, 20, 20, 512, 512, 3),    # stage-4
    (128, 160, 160, 64, 64, 1),    # FPN lateral
]

key = jax.random.PRNGKey(0)
print(f"{'shape':38s} {'bf16 ms':>8s} {'int8 ms':>8s} {'ratio':>6s}")
for b, h, w, ci, co, k in SHAPES:
    x = jax.random.normal(key, (b, h, w, ci), jnp.bfloat16)
    wt = jax.random.normal(key, (k, k, ci, co), jnp.bfloat16)
    f_bf = jax.jit(lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32)))
    t_bf = bench(f_bf, x, wt)

    xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(wt.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
    try:
        f_i8 = jax.jit(lambda x, w: jnp.sum(conv(x, w, jnp.int32)))
        t_i8 = bench(f_i8, xi, wi)
    except Exception as e:
        t_i8 = float("nan")
        print(f"  int8 failed: {type(e).__name__}: {str(e)[:120]}")
    ratio = t_bf / t_i8 if t_i8 == t_i8 else float("nan")
    print(f"({b},{h},{w},{ci})x({k},{k},{ci},{co})".ljust(38), f"{t_bf:8.3f} {t_i8:8.3f} {ratio:6.2f}")

# end-to-end flavor: dynamic act quant + conv + dequant + relu, bf16 in/out
print("\nwith quant/dequant overhead folded in (bf16 in -> bf16 out):")
for b, h, w, ci, co, k in SHAPES:
    x = jax.random.normal(key, (b, h, w, ci), jnp.bfloat16)
    wt = jax.random.normal(key, (k, k, ci, co), jnp.bfloat16)
    wi = jnp.clip(jnp.round(wt.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)

    def q_fwd(x, wi):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        s = 127.0 / jnp.maximum(amax, 1e-6)
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) * s), -127, 127).astype(jnp.int8)
        acc = conv(xi, wi, jnp.int32)
        y = jax.nn.relu((acc.astype(jnp.float32) / (s * 16.0)).astype(jnp.bfloat16))
        return jnp.sum(y.astype(jnp.float32))

    def bf_fwd(x, wt):
        return jnp.sum(jax.nn.relu(conv(x, wt)).astype(jnp.float32))

    t_bf = bench(jax.jit(bf_fwd), x, wt)
    t_q = bench(jax.jit(q_fwd), x, wi)
    print(f"({b},{h},{w},{ci})x({k},{k},{ci},{co})".ljust(38), f"{t_bf:8.3f} {t_q:8.3f} {t_bf/t_q:6.2f}")
