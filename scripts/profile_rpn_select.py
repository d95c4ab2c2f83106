"""Micro-profile of the RPN selection stage (predict_proposals) at serving
shapes: per-level approx top-k, gathers+decode, Pallas NMS, final global top-k.

Run: PYTHONPATH=. python scripts/profile_rpn_select.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 640


def _timed(name, fn, *args, iters=20, warmup=2):
    s = fn(*args)
    np.asarray(s)
    for _ in range(warmup):
        s = fn(*args)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.2f} ms/batch", flush=True)
    return dt


def main(batch=128, pre_k_arg=1000, post_k_arg=300):
    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models.backbone import fpn_output_shapes
    from detax.models.rpn import predict_proposals, rpn_anchors
    from detax.ops import box_transform
    from detax.ops.nms_pallas import nms_keep_sorted_batched
    from detax.structures import boxes as box_ops

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    conf = base.rpn.replace(
        pre_nms_topk=(2000, pre_k_arg), post_nms_topk=(2000, post_k_arg),
        nms_impl="pallas", topk_impl="approx",
    )
    strides_map = {k: v.stride for k, v in fpn_output_shapes(base.backbone).items()}
    in_feats = conf.in_features
    strides = [strides_map[f] for f in in_feats]
    shapes = [(SIZE // s, SIZE // s) for s in strides]
    anchors = rpn_anchors(conf, shapes, strides)
    num_anchors = [a.shape[0] for a in anchors]
    print(f"levels={in_feats} strides={strides} anchors/level={num_anchors}")

    rng = np.random.RandomState(0)
    logits = [jnp.asarray(rng.randn(batch, n), jnp.bfloat16) for n in num_anchors]
    deltas = [jnp.asarray(rng.randn(batch, n, 4) * 0.1, jnp.bfloat16) for n in num_anchors]
    sizes = jnp.full((batch, 2), SIZE, jnp.int32)

    pre_k = conf.pre_nms_topk[1]
    post_k = conf.post_nms_topk[1]

    def _select_prefix(stage):
        def f(logits, deltas, sizes):
            acc = jnp.float32(0)
            top = []
            for lvl, (anch, lg, dl) in enumerate(zip(anchors, logits, deltas)):
                k = min(pre_k, lg.shape[-1])
                if k < lg.shape[-1]:
                    sc, idx = jax.lax.approx_max_k(lg, k)
                else:
                    sc, idx = jax.lax.top_k(lg, k)
                if stage == "topk":
                    acc += jnp.sum(sc.astype(jnp.float32)) + jnp.sum(idx)
                    continue
                sel_deltas = jnp.take_along_axis(dl, idx[..., None], axis=1)
                sel_anchors = jnp.take(anch, idx, axis=0)
                bx = box_transform.apply_deltas(
                    sel_deltas, sel_anchors,
                    conf.box2box_transform.weights, conf.box2box_transform.scale_clamp)
                bx = box_ops.clip(bx, sizes[:, 0:1], sizes[:, 1:2])
                valid = (jnp.all(jnp.isfinite(bx), axis=-1) & jnp.isfinite(sc)
                         & box_ops.nonempty(bx, conf.min_box_size))
                if stage == "decode":
                    acc += jnp.sum(bx.astype(jnp.float32)) + jnp.sum(valid)
                    continue
                top.append((bx, sc, valid))
            if stage in ("topk", "decode"):
                return acc
            keeps = [nms_keep_sorted_batched(b, v, conf.nms_thresh) for b, _, v in top]
            if stage == "nms":
                return sum(jnp.sum(k) for k in keeps) * 1.0
            boxes = jnp.concatenate([b for b, _, _ in top], axis=1)
            scores = jnp.concatenate([s for _, s, _ in top], axis=1)
            kept = jnp.concatenate(keeps, axis=1)
            gated = jnp.where(kept, scores, -jnp.inf)
            ps, ti = jax.lax.top_k(gated, post_k)
            pb = jnp.take_along_axis(boxes, ti[..., None], axis=1)
            return jnp.sum(pb.astype(jnp.float32)) + jnp.sum(ps.astype(jnp.float32))
        return jax.jit(f)

    t_topk = _timed("per-level approx top-k", _select_prefix("topk"), logits, deltas, sizes)
    t_dec = _timed("+gathers+decode+clip", _select_prefix("decode"), logits, deltas, sizes)
    t_nms = _timed("+Pallas NMS (per level)", _select_prefix("nms"), logits, deltas, sizes)
    t_full = _timed("+global top-k+gather (full)", _select_prefix("full"), logits, deltas, sizes)

    print("\ndeltas:")
    print(f"  top-k      {t_topk:7.2f}")
    print(f"  decode     {t_dec - t_topk:7.2f}")
    print(f"  NMS        {t_nms - t_dec:7.2f}")
    print(f"  final      {t_full - t_nms:7.2f}")
    print(f"  TOTAL      {t_full:7.2f}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
