"""Device-mesh parallelism utilities.

The reference has **no** distributed machinery (SURVEY.md §2.4: only a dead
``DataParallel`` isinstance check, ``models/base.py:53``, and an unused SyncBN
option). detax makes scaling first-class the TPU way: ``jax.sharding.Mesh`` +
``NamedSharding`` annotations, XLA-inserted collectives over ICI, multi-host
init over DCN.
"""

from detax.dist.mesh import (
    create_mesh,
    data_sharding,
    initialize_multihost,
    replicate,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "initialize_multihost",
    "replicate",
    "shard_batch",
]
