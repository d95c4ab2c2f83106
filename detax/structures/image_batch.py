"""Static-shape image batches — the TPU replacement for ``ImageList``.

The reference pads variable-size images to a common HW on the fly
(``ImageList.from_tensors``, ``python/src/structures/image_list.py:65-117``).
On TPU dynamic padded sizes would trigger recompilation per batch, so detax
letterboxes every image to one fixed ``(size, size)`` canvas (default 640) at
preprocessing time and carries the original sizes + scales needed to map
predicted boxes back to input coordinates.

Layout is NHWC (TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImageBatch:
    """A letterboxed NHWC image batch.

    - ``pixels``: ``(B, H, W, C)`` normalized pixels (H == W == canvas size).
    - ``image_sizes``: ``(B, 2)`` float32 ``(height, width)`` of the *valid*
      (scaled image) region inside the canvas — the analog of the reference's
      ``ImageList.image_sizes`` used to clip proposals
      (``models/utils.py:86``).
    - ``scales``: ``(B,)`` float32 factor mapping original-image coords to
      canvas coords (multiply to go original→canvas).
    """

    pixels: Array
    image_sizes: Array
    scales: Array

    @property
    def canvas_hw(self) -> tuple:
        return self.pixels.shape[1], self.pixels.shape[2]

    @staticmethod
    def from_pixels(pixels: Array) -> "ImageBatch":
        """Wrap an already-uniform batch: valid region = full canvas."""
        b, h, w = pixels.shape[0], pixels.shape[1], pixels.shape[2]
        sizes = jnp.tile(jnp.array([[h, w]], jnp.float32), (b, 1))
        return ImageBatch(pixels=pixels, image_sizes=sizes, scales=jnp.ones((b,), jnp.float32))
