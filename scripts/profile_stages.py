"""Per-stage timing of the flagship serving program on real TPU.

Builds the exact bench.py serving config, then times a ladder of prefix
programs (stem → backbone → +RPN head → +selection → +ROIAlign → +box head
→ full) plus standalone pieces. Every program reduces to a scalar inside
jit (materializing outputs would measure the tunnel, not the chip).

Run: python scripts/profile_stages.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 640


def _timed(name, fn, *args, iters=10, warmup=2):
    t0 = time.time()
    s = fn(*args)
    np.asarray(s)
    compile_s = time.time() - t0
    for _ in range(warmup):
        s = fn(*args)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms/batch   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main(batch=128):
    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models import FasterRCNN
    from detax.models.backbone import fpn_output_shapes
    from detax.models.fpn import FPN
    from detax.models.roi_heads import StandardROIHeads, fast_rcnn_inference, pool_features
    from detax.models.rpn import RegionProposalNetwork, predict_proposals, rpn_anchors
    from detax.nn.stem import BasicStem
    from detax.structures.image_batch import ImageBatch

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    # the exact benched serving_lean profile (keep in lockstep with
    # bench.py's flagship config)
    conf = base.replace(
        rpn=base.rpn.replace(
            pre_nms_topk=(2000, 384), post_nms_topk=(2000, 192),
            nms_impl="pallas", topk_impl="approx", topk_recall=0.8,
        ),
        roi=base.roi.replace(
            nms_impl="pallas", topk_impl="approx", pre_nms_candidates=384,
            box_pooler=base.roi.box_pooler.replace(sampling_ratio=2, impl="pallas", keep_ph_pad=True),
        ),
    )
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(batch, SIZE, SIZE, 3), jnp.bfloat16)  # bench ships bf16
    images = ImageBatch.from_pixels(pixels)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ImageBatch.from_pixels(pixels[:1]))

    p = params["params"]
    strides = {k: v.stride for k, v in fpn_output_shapes(conf.backbone).items()}
    in_feats = conf.rpn.in_features

    backbone = FPN(conf=conf.backbone, dtype=jnp.bfloat16)
    rpn = RegionProposalNetwork(conf=conf.rpn, dtype=jnp.bfloat16)
    roi = StandardROIHeads(conf=conf.roi, dtype=jnp.bfloat16)
    stem = BasicStem(out_channels=conf.backbone.bottom_up.stem_channels,
                     norm=conf.backbone.bottom_up.norm, dtype=jnp.bfloat16)

    def _sum(tree):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def f_stem(px):
        return _sum(stem.apply({"params": p["backbone"]["bottom_up"]["stem"]}, px))

    @jax.jit
    def f_backbone(px):
        return _sum(backbone.apply({"params": p["backbone"]}, px))

    def _rpn_head(px):
        feats = backbone.apply({"params": p["backbone"]}, px)
        rpn_feats = [feats[f] for f in in_feats]
        logits, deltas = rpn.apply({"params": p["rpn"]}, rpn_feats)
        return feats, logits, deltas

    @jax.jit
    def f_rpn_head(px):
        feats, logits, deltas = _rpn_head(px)
        return _sum(logits) + _sum(deltas)

    def _proposals(px, sizes):
        feats, logits, deltas = _rpn_head(px)
        rpn_feats_shapes = [feats[f].shape[1:3] for f in in_feats]
        lvl_strides = [strides[f] for f in in_feats]
        anchors = rpn_anchors(conf.rpn, rpn_feats_shapes, lvl_strides)
        props = predict_proposals(conf.rpn, anchors, logits, deltas, sizes, train=False,
                                  feature_shapes=rpn_feats_shapes, strides=lvl_strides)
        return feats, props

    @jax.jit
    def f_select(px, sizes):
        feats, props = _proposals(px, sizes)
        return _sum(props.boxes) + _sum(props.scores)

    @jax.jit
    def f_pool(px, sizes):
        feats, props = _proposals(px, sizes)
        pooled = pool_features(conf.roi, feats, strides, props.boxes)
        return _sum(pooled)

    @jax.jit
    def f_boxhead(px, sizes):
        feats, props = _proposals(px, sizes)
        pooled = pool_features(conf.roi, feats, strides, props.boxes)
        scores, box_deltas = roi.apply({"params": p["roi"]}, pooled, train=False)
        return _sum(scores) + _sum(box_deltas)

    @jax.jit
    def f_full(px, sizes):
        feats, props = _proposals(px, sizes)
        pooled = pool_features(conf.roi, feats, strides, props.boxes)
        scores, box_deltas = roi.apply({"params": p["roi"]}, pooled, train=False)
        dets = fast_rcnn_inference(conf.roi, scores, box_deltas, props.boxes, props.valid, sizes)
        return _sum(dets.scores)

    px, sizes = images.pixels, images.image_sizes
    t_stem = _timed("stem", f_stem, px)
    t_bb = _timed("backbone+FPN", f_backbone, px)
    t_head = _timed("+RPN head", f_rpn_head, px)
    t_sel = _timed("+RPN select+NMS", f_select, px, sizes)
    t_pool = _timed("+ROIAlign", f_pool, px, sizes)
    t_bh = _timed("+box head", f_boxhead, px, sizes)
    t_full = _timed("FULL (+final NMS)", f_full, px, sizes)

    print("\nstage deltas:")
    print(f"  stem             {t_stem:7.2f}")
    print(f"  body+FPN         {t_bb - t_stem:7.2f}")
    print(f"  RPN head         {t_head - t_bb:7.2f}")
    print(f"  RPN select+NMS   {t_sel - t_head:7.2f}")
    print(f"  ROIAlign         {t_pool - t_sel:7.2f}")
    print(f"  box head         {t_bh - t_pool:7.2f}")
    print(f"  final NMS        {t_full - t_bh:7.2f}")
    print(f"  FULL             {t_full:7.2f}  -> {batch / t_full * 1000:.0f} img/s")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
