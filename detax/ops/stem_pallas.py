"""Fused Pallas TPU stem: space-to-depth conv 7×7/2 + frozen-BN + ReLU +
3×3/2 max-pool in ONE kernel pass.

Why: the stem is the worst XLA stretch of the backbone — `reduce_window`
(max-pool) alone costs ~4.7 ms per batch-32 at 640² (~125 GB/s effective)
and the 12-input-channel conv another ~4 ms; together a third of the whole
ResNet-18 time. Fusing them reads the (space-to-depth) input once and
writes only the pooled (B, H/4, W/4, 64) output.

Formulation (per 16-output-row program):

- the host ships the input transposed/padded as ``xs_T (B, H/2+8, 12,
  384)`` — rows = s2d rows (3-row top pad), sublanes = the 12 s2d
  channels, lanes = s2d columns at a +2 offset. One strip DMA of 36 rows
  covers a program.
- conv row ``y[g]``: the 16 (ty, tx) taps become 16 STATIC sublane-slices
  of the collapsed ``(432, 384)`` strip, lane-rolled by ``-tx`` and
  concatenated into a ``(192, 384)`` rhs, then ONE MXU matmul with the
  folded kernel ``W (64, 192)`` (BN scale folded in; bias + ReLU applied
  on the fp32 accumulator). Positions stay in lanes throughout — no
  lane↔sublane reshapes (Mosaic forbids them).
- pooling is separable: a ring of 3 conv-row results gives the y-max; the
  x-max is ``max(m, roll(m, ±1))``; the stride-2 lane selection is a 0/1
  selector MATMUL (after a max, selection is a permutation, so sum ≡
  select). Out-of-image lanes/rows are masked to −1 (ReLU output is ≥ 0,
  so −1 loses every max — no −inf, whose 0·(−inf)=NaN would poison the
  selector matmul).

Semantics identical to the XLA stem path (same taps, same zero padding,
same −inf-equivalent pool borders); parity-tested against it (1.4e-6 vs a
Precision.HIGHEST XLA reference on real TPU).

Status: EXPERIMENTAL — measured AT PARITY with the XLA composition (6.7 vs
6.6 ms per batch-32 at 640², incl. the s2d prep), not faster: the per-row
rhs materialisation (concat of 16 rolled (12,384) slices) costs as much as
XLA's whole conv+reduce_window. Kept as a working reference for the strip/
roll/selector conv pattern and for a future revision that batches the rhs
build; the production stem stays on the XLA space-to-depth path
(detax/nn/stem.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 384  # padded s2d-column extent (supports W/2 ≤ 380)
_ROWS_PER_PROG = 16  # pooled output rows per program
_KTAPS = 16  # 4x4 taps on the s2d grid
_CIN = 12  # s2d channels (2x2x3)
_CIN_PAD = 16  # sublane-tile-aligned channel rows in the transposed layout


def _kernel_factory(c_out: int, w_out: int, strip_rows: int, out_dtype, is_f32: bool):
    n_y = 2 * _ROWS_PER_PROG + 1  # conv rows needed by one program

    def kernel(w_ref, b_ref, s_ref, xs_ref, out_ref, strip, r_scr, sem):
        k2 = pl.program_id(1)

        # strip DMA: 36 s2d rows (12 sublane-channels each) for this block
        cp = pltpu.make_async_copy(
            xs_ref.at[pl.program_id(0), pl.ds(k2 * 2 * _ROWS_PER_PROG, strip_rows), :, :],
            strip,
            sem,
        )
        cp.start()

        precision = jax.lax.Precision.HIGHEST if is_f32 else jax.lax.Precision.DEFAULT
        lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, _LANES), 1)
        # valid conv columns: lanes [2, 2 + W/2) hold real s2d columns
        lane_ok = (lane >= 2) & (lane < 2 + 2 * w_out)
        w_mat = w_ref[:]  # (64, 192) fp32, BN scale folded
        bias = b_ref[:]  # (64, 1) fp32

        cp.wait()
        # strip is fp32: Mosaic cannot lane-rotate sub-32-bit vectors, and
        # the rhs build is all rolls; the matmul casts down afterwards
        s2d = strip[:].reshape(strip_rows * _CIN_PAD, _LANES)
        mm_dtype = jnp.float32 if is_f32 else out_dtype

        # v2: write every (strip-row, tx) rolled slice ONCE into the rhs
        # scratch, laid out so a conv row's whole (192, 384) rhs is a
        # CONTIGUOUS sublane range — r_scr row order is (s, tx, cin), and
        # conv row ly (taps s = ly..ly+3, ty-major weight order) reads
        # r_scr[ly·48 : ly·48+192] with zero copies. The v1 kernel instead
        # re-concatenated 16 slices per conv row (33 × 16 copies), which
        # measured as expensive as XLA's whole conv+pool.
        for s in range(strip_rows):
            sl = s2d[s * _CIN_PAD:s * _CIN_PAD + _CIN, :]
            for tx in range(4):
                # output lane xp (conv col x = xp−2) needs the value at
                # lane xp + tx − 2 → roll by 2 − tx (non-negative form)
                shift = (2 - tx) % _LANES
                r_scr[s * 4 * _CIN + tx * _CIN:s * 4 * _CIN + (tx + 1) * _CIN, :] = (
                    (sl if shift == 0 else pltpu.roll(sl, shift, axis=1)).astype(mm_dtype)
                )

        def conv_row(ly):
            """conv output row (64, 384) for local conv-row index ly."""
            rhs = r_scr[ly * 4 * _CIN:(ly + 4) * 4 * _CIN, :]  # (192, 384), no copy
            acc = jnp.dot(
                w_mat.astype(mm_dtype), rhs,
                preferred_element_type=jnp.float32, precision=precision,
            )
            z = jnp.maximum(acc + bias, 0.0)  # (64, 384) fp32
            return jnp.where(lane_ok, z, -1.0)

        ring = [None, None, None]
        for ly in range(n_y):
            z = conv_row(ly)
            ring = [ring[1], ring[2], z]
            if ly >= 2 and ly % 2 == 0:
                rr = (ly - 2) // 2
                z0 = ring[0]
                if rr == 0:
                    # global conv row −1 exists only as padding: its conv
                    # output is relu(bias), NOT a −inf pool border — mask it
                    # out for the first block
                    z0 = jnp.where(k2 == 0, -1.0, z0)
                m = jnp.maximum(jnp.maximum(z0, ring[1]), ring[2])
                m = jnp.maximum(
                    jnp.maximum(pltpu.roll(m, 1, axis=1), m),
                    pltpu.roll(m, _LANES - 1, axis=1),
                )  # 3-tap x-max
                # stride-2 lane selection via 0/1 matmul (exact post-max;
                # bf16 on the serving path — a fp32 MXU matmul decomposes
                # into several passes, and bf16 is the output precision)
                sel = jnp.dot(
                    m.astype(mm_dtype), s_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32, precision=precision,
                )  # (64, w_out)
                out_ref[0, rr] = sel.T.astype(out_dtype)

    return kernel


def fused_stem(
    xs: Array,
    w4: Array,
    scale: Array,
    bias: Array,
    interpret: bool | None = None,
) -> Array:
    """Space-to-depth stem, fused.

    Args:
      xs: ``(B, H2, W2, 12)`` space-to-depth input (H2 = H/2); H2 % 32 == 0,
        W2 % 2 == 0, W2 ≤ 380.
      w4: ``(4, 4, 12, 64)`` s2d-reparameterised conv kernel.
      scale/bias: ``(64,)`` folded norm affine (identity → ones/zeros).

    Returns ``(B, H2/2, W2/2, 64)`` — conv(+affine+relu) then 3×3/2 max-pool.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h2, w2, cin = xs.shape
    assert cin == _CIN and h2 % (2 * _ROWS_PER_PROG) == 0 and w2 % 2 == 0
    assert w2 + 4 <= _LANES, f"W/2={w2} exceeds the {_LANES}-lane stem kernel"
    c_out = w4.shape[-1]
    assert c_out == 64
    dtype = xs.dtype
    is_f32 = jnp.dtype(dtype) == jnp.float32
    xs = xs.astype(jnp.float32)  # strip stays fp32 (rolls; see kernel)
    h_out, w_out = h2 // 2, w2 // 2
    strip_rows = 2 * _ROWS_PER_PROG + 4  # 33 conv rows need 36 s2d rows

    # rows: 3-row top pad (so every program's strip starts at 32·k2) and
    # enough bottom pad for the last strip; lanes: +2 left offset
    bot = strip_rows + (h2 // (2 * _ROWS_PER_PROG) - 1) * 2 * _ROWS_PER_PROG - (h2 + 3)
    # channel rows pad 12→16: DMA slice sizes must be sublane-tile-aligned
    xs_t = jnp.pad(xs, ((0, 0), (3, bot), (2, _LANES - w2 - 2), (0, _CIN_PAD - _CIN)))
    xs_t = xs_t.transpose(0, 1, 3, 2)  # (B, H2+8, 16, 384)

    w_flat = (w4 * scale[None, None, None, :]).transpose(3, 0, 1, 2).reshape(c_out, _KTAPS * _CIN)
    s_sel = np.zeros((_LANES, w_out), np.float32)
    s_sel[2 + 2 * np.arange(w_out), np.arange(w_out)] = 1.0

    kernel = _kernel_factory(c_out, w_out, strip_rows, dtype, is_f32)
    out = pl.pallas_call(
        kernel,
        grid=(b, h_out // _ROWS_PER_PROG),
        in_specs=[
            pl.BlockSpec((c_out, _KTAPS * _CIN), lambda i, j: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((_LANES, w_out), lambda i, j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, _ROWS_PER_PROG, w_out, c_out), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((strip_rows, _CIN_PAD, _LANES), jnp.float32),
            pltpu.VMEM(
                (strip_rows * 4 * _CIN, _LANES),
                jnp.float32 if is_f32 else dtype,
            ),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        jnp.asarray(w_flat, jnp.float32),
        jnp.asarray(bias, jnp.float32).reshape(c_out, 1),
        jnp.asarray(s_sel),
        xs_t,
    )
    return out
