"""Pure-functional detection ops — the framework's compute-primitive tier.

This package replaces both the reference's algorithmic components
(``python/src/models/components/``: Matcher, Box2BoxTransform, dense box loss)
and its *native* dependency surface (torchvision's C++/CUDA ``nms`` /
``roi_align`` kernels, reference ``python/src/utils.py:96-119`` and
``modules/roi_poolers.py``): every op here is a mask-aware, static-shape JAX
function that lowers to XLA, with Pallas TPU kernels for the suppression hot
path in ``nms_pallas``.
"""

from detax.ops.box_transform import apply_deltas, get_deltas
from detax.ops.matcher import match
from detax.ops.sampling import subsample_labels
from detax.ops.nms import batched_nms, nms_select, suppression_mask
from detax.ops.roi_align import multiscale_roi_align, roi_align, roi_pool

__all__ = [
    "apply_deltas",
    "get_deltas",
    "match",
    "subsample_labels",
    "batched_nms",
    "nms_select",
    "suppression_mask",
    "multiscale_roi_align",
    "roi_align",
    "roi_pool",
]
