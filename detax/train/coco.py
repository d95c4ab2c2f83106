"""COCO-style dataset pipeline (BASELINE config 5: COCO-subset fine-tune).

The reference has no dataset/dataloader at all (SURVEY.md §0). detax provides:

- a reader for COCO-format annotation JSON + image files (decoded host-side
  with PIL when available);
- a synthetic COCO-subset generator (random "objects" drawn onto canvases)
  so the fine-tune loop and benchmarks run hermetically with zero downloads;
- fixed-shape batching: images letterboxed to the static canvas, GT padded to
  ``max_gt_boxes`` — the host→device contract of the whole framework;
- :func:`prefetch_batches`: a background-thread prefetcher (bounded queue)
  that overlaps host batch preparation with the device step, so the jitted
  train step never waits on numpy letterboxing/augmentation.

JPEG decode goes through PIL here; the native C++ libjpeg loader in
``detax.serve.native`` serves the latency-critical serving path.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from detax.configs.detector import PreprocessConf
from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch


def synthesize_detection_image(
    rng: np.random.RandomState,
    size: int,
    num_classes: int,
    max_objects: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Draw colored rectangles on noise — a hermetic stand-in for COCO images.

    Returns ``(uint8 HWC image, (g, 4) boxes, (g,) classes)``. Each class has
    a distinctive color so a detector can actually learn from this data.
    """
    img = (rng.rand(size, size, 3) * 60).astype(np.uint8)
    n = rng.randint(1, max_objects + 1)
    boxes, classes = [], []
    # log-uniform side lengths over [~size/32, size/2]: the old uniform
    # [size//10, size//2) floor left the COCO-small bucket (area < 32²)
    # essentially unpopulated (measured: 3 of 283 eval GTs at 256px, 1.1%),
    # so stride-8 heads got no training signal and APs was a coin flip over
    # ~3 objects — dmap_yolo_r4.json's APs=0.000 was a data artifact, not a
    # head failure. Log-uniform puts ~1/3 of objects in each COCO bucket.
    lo, hi = max(6, size // 32), size // 2
    for _ in range(n):
        w = int(round(np.exp(rng.uniform(np.log(lo), np.log(hi)))))
        h = int(round(np.exp(rng.uniform(np.log(lo), np.log(hi)))))
        x1 = rng.randint(0, size - w)
        y1 = rng.randint(0, size - h)
        cls = rng.randint(0, num_classes)
        color = np.array(
            [(cls * 37) % 200 + 55, (cls * 91) % 200 + 55, (cls * 53) % 200 + 55], np.uint8
        )
        img[y1 : y1 + h, x1 : x1 + w] = color
        boxes.append([x1, y1, x1 + w, y1 + h])
        classes.append(cls)
    return img, np.asarray(boxes, np.float32), np.asarray(classes, np.int32)


class SyntheticCOCO:
    """Infinite synthetic detection dataset with a fixed number of base images.

    ``cache=True`` memoizes generated items (uint8 + GT): epoch 2+ costs a
    dict lookup instead of regenerating ~1.2 MB of random pixels per image —
    the synthesis itself is the dominant host cost of the training feed.
    """

    def __init__(
        self, num_images: int = 256, image_size: int = 640, num_classes: int = 80,
        seed: int = 0, cache: bool = False, max_objects: int = 8,
    ):
        self.num_images = num_images
        self.image_size = image_size
        self.num_classes = num_classes
        self.seed = seed
        self.max_objects = max_objects
        self._cache: Optional[Dict[int, tuple]] = {} if cache else None

    def __len__(self) -> int:
        return self.num_images

    def get(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._cache is not None and index in self._cache:
            return self._cache[index]
        rng = np.random.RandomState(self.seed * 100003 + index)
        item = synthesize_detection_image(
            rng, self.image_size, self.num_classes, max_objects=self.max_objects
        )
        if self._cache is not None:
            self._cache[index] = item
        return item


def _decode_image(path: str) -> np.ndarray:
    """Decode one image file: native libjpeg (the first-party C++ loader in
    ``detax.serve.native`` — same decoder the serving path uses) for JPEGs,
    PIL fallback otherwise. Unifies the train and serve decode paths
    (VERDICT r3 item 3)."""
    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            from detax.serve.loader import decode_jpeg, have_native_loader

            if have_native_loader():
                with open(path, "rb") as f:
                    return decode_jpeg(f.read())
        except Exception:
            pass  # fall through to PIL
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


class COCOReader:
    """COCO-format annotation reader (instances JSON + image dir)."""

    def __init__(self, annotation_file: str, image_dir: str):
        with open(annotation_file) as f:
            data = json.load(f)
        self.image_dir = image_dir
        self.images = {im["id"]: im for im in data["images"]}
        # contiguous class ids (COCO category ids are sparse)
        cat_ids = sorted(c["id"] for c in data["categories"])
        self.cat_to_contiguous = {cid: i for i, cid in enumerate(cat_ids)}
        self.annotations: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self.annotations.setdefault(ann["image_id"], []).append(ann)
        self.ids = sorted(self.images)

    def __len__(self) -> int:
        return len(self.ids)

    def get(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        image_id = self.ids[index]
        info = self.images[image_id]
        img = _decode_image(os.path.join(self.image_dir, info["file_name"]))
        anns = self.annotations.get(image_id, [])
        boxes, classes = [], []
        for a in anns:
            x, y, w, h = a["bbox"]  # COCO xywh → xyxy
            boxes.append([x, y, x + w, y + h])
            classes.append(self.cat_to_contiguous[a["category_id"]])
        return (
            img,
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(classes, np.int32),
        )


def rasterize_box_masks(boxes: np.ndarray, hw: Tuple[int, int], stride: int) -> np.ndarray:
    """(g, 4) canvas-coordinate boxes → (g, H/stride, W/stride) uint8 bitmaps.

    Exact instance masks for the synthetic rectangle dataset; a COCO polygon
    rasterizer can slot in here for real data.
    """
    h, w = hw[0] // stride, hw[1] // stride
    out = np.zeros((len(boxes), h, w), np.uint8)
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes)):
        out[i] = (
            (ys[:, None] >= y1) & (ys[:, None] < y2) & (xs[None, :] >= x1) & (xs[None, :] < x2)
        )
    return out


def rasterize_box_masks_device(boxes, hw: Tuple[int, int], stride: int):
    """jnp twin of :func:`rasterize_box_masks`: ``(..., G, 4)`` canvas-coord
    boxes → ``(..., G, H/stride, W/stride)`` uint8 bitmaps, computed ON
    DEVICE — so ``--feed cached --masks`` rasterizes targets from the cached
    GT boxes inside the jitted gather and ships NO bitmaps over the wire
    (the host path moved 50-110 MB/s and capped Mask R-CNN training at
    40-90 img/s; see the wire analysis below)."""
    import jax.numpy as jnp

    h, w = hw[0] // stride, hw[1] // stride
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    yin = (ys >= boxes[..., 1, None]) & (ys < boxes[..., 3, None])  # (..., G, h)
    xin = (xs >= boxes[..., 0, None]) & (xs < boxes[..., 2, None])  # (..., G, w)
    return (yin[..., :, None] & xin[..., None, :]).astype(jnp.uint8)


def make_batches(
    dataset,
    batch_size: int,
    preprocess: PreprocessConf,
    max_gt_boxes: int = 100,
    seed: int = 0,
    epochs: Optional[int] = None,
    rect_masks: bool = False,
    device_normalize: bool = False,
    shuffle: bool = True,
) -> Iterator[Tuple[ImageBatch, GroundTruth]]:
    """Host-side batcher: letterbox to the static canvas, pad GT.

    Letterboxing happens here in numpy (the on-device fused path in
    ``detax.ops.preprocess`` is used when images share one source shape, as
    in serving); GT boxes are scaled into canvas coordinates.

    ``device_normalize=True`` is the fast feed: the canvas ships as raw
    uint8 (host work = memcpy; resize stays host-side but skips the float
    normalize and the 4× larger f32 transfer) and the train step applies
    :func:`detax.ops.preprocess.normalize_canvas` on device. For sources
    already at canvas scale (the synthetic set) the pixel values are
    bit-identical to the host-normalized path.
    """
    import jax.numpy as jnp

    size = preprocess.image_size
    mean = np.asarray(preprocess.pixel_mean, np.float32)
    std = np.asarray(preprocess.pixel_std, np.float32)
    rng = np.random.RandomState(seed)
    n = len(dataset)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idxs = order[start : start + batch_size]
            pix_dtype = np.uint8 if device_normalize else np.float32
            pixels = np.zeros((batch_size, size, size, 3), pix_dtype)
            sizes = np.zeros((batch_size, 2), np.float32)
            scales = np.zeros((batch_size,), np.float32)
            boxes_list, classes_list = [], []
            for bi, di in enumerate(idxs):
                img, boxes, classes = dataset.get(int(di))
                h0, w0 = img.shape[:2]
                scale = min(size / h0, size / w0)
                nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
                if (nh, nw) != (h0, w0):
                    img = _resize_bilinear(img.astype(np.float32), nh, nw)
                if device_normalize:
                    pixels[bi, :nh, :nw] = img  # uint8 memcpy (or rounded resize)
                else:
                    pixels[bi, :nh, :nw] = (img - mean) / std
                sizes[bi] = (nh, nw)
                scales[bi] = scale
                boxes_list.append(boxes * scale)
                classes_list.append(classes)
            masks_list = None
            mask_hw = None
            if rect_masks:
                mask_hw = (size // preprocess.mask_stride, size // preprocess.mask_stride)
                masks_list = [
                    rasterize_box_masks(b[:max_gt_boxes], (size, size), preprocess.mask_stride)
                    for b in boxes_list
                ]
            yield (
                ImageBatch(
                    pixels=jnp.asarray(pixels),
                    image_sizes=jnp.asarray(sizes),
                    scales=jnp.asarray(scales),
                ),
                GroundTruth.from_lists(
                    boxes_list, classes_list, max_gt_boxes,
                    masks_list=masks_list, mask_hw=mask_hw,
                ),
            )
        epoch += 1


def prefetch_batches(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run ``iterator`` in a daemon thread, buffering up to ``depth`` items.

    The host-side batch prep (decode, letterbox, GT padding — all numpy)
    overlaps with the device step that consumes the previous batch; a depth
    of 2 is enough to hide it completely when prep is faster than the step.
    Exceptions from the producer re-raise at the consumer's ``next()``.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _end = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_end)
        except BaseException as e:  # propagate to the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _resize_bilinear(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Minimal host bilinear resize (PIL-free path for synthetic data)."""
    h, w = img.shape[:2]
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def build_device_cache(
    dataset,
    preprocess: PreprocessConf,
    max_gt_boxes: int = 100,
    rect_masks: bool = False,
) -> Tuple[ImageBatch, GroundTruth]:
    """Upload the WHOLE dataset to the device once (uint8 canvases + GT).

    The TPU-native answer to the host-feed bound (VERDICT r3 item 3): on this
    class of host the sustained 640² train rate is capped by host→device
    transfer (~45 MB/s tunnel here: a batch-8 uint8 canvas feed alone caps at
    ~36 img/s) — no host-side loader, C++ or otherwise, can beat the wire.
    For fine-tune-scale datasets (COCO-subset: 256 images × 640² uint8 ≈
    300 MB; a 16 GB chip holds thousands) the dataset crosses the wire ONCE;
    every step then ships only a batch-size index array and the batch is
    assembled ON DEVICE by :func:`gather_cached_batch` (augmentation was
    already on-device). Streaming datasets keep the host feed
    (``make_batches`` + the native JPEG loader in ``detax.serve.native``).
    """
    it = make_batches(
        dataset, len(dataset), preprocess, max_gt_boxes=max_gt_boxes,
        epochs=1, rect_masks=rect_masks, device_normalize=True,
        shuffle=False,  # cache row i == dataset item i (indices address it)
    )
    return next(it)


def make_cached_gather(mask_spec: Optional[Tuple[int, int]] = None):
    """Jitted on-device batch assembly: ``(cache_images, cache_gt, idx) →
    (ImageBatch, GroundTruth)`` — a pure gather along the dataset dim.

    ``mask_spec=(image_size, mask_stride)`` additionally rasterizes rect
    instance bitmaps on device from the gathered GT boxes (the cache itself
    stores none), fused into the same jitted program."""
    import dataclasses as _dc

    import jax

    def gather(cache_images, cache_gt, idx):
        import jax.numpy as jnp

        take = lambda x: jnp.take(x, idx, axis=0)
        images = jax.tree_util.tree_map(take, cache_images)
        gt = jax.tree_util.tree_map(take, cache_gt)
        if mask_spec is not None:
            size, stride = mask_spec
            gt = _dc.replace(
                gt, masks=rasterize_box_masks_device(gt.boxes, (size, size), stride)
            )
        return images, gt

    return jax.jit(gather)


def cached_index_batches(n: int, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Infinite shuffled index stream over a device cache of ``n`` items."""
    rng = np.random.RandomState(seed)
    while True:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            yield order[start : start + batch_size].astype(np.int32)
