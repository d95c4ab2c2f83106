"""detax — a TPU-native (JAX / XLA / Pallas / pjit) object-detection framework.

Brand-new implementation of the capabilities of the reference repo
``andompesta/object-detection-pytorch-rust`` (a PyTorch Detectron2-style
Faster R-CNN pipeline), redesigned TPU-first:

- static shapes everywhere (letterboxed images, padded box sets with validity
  masks) so XLA can compile one program per config,
- pure-functional ops (``detax.ops``) instead of stateful torch modules,
- Flax modules for the conv stacks (``detax.nn``/``detax.models``) lowered to
  the TPU MXU,
- Pallas kernels for the suppression hot path (``detax.ops.nms_pallas``),
- ``jax.sharding`` mesh parallelism instead of torch DataParallel
  (``detax.dist``),
- a batched TPU inference server (``detax.serve``) standing in for the
  reference's named-but-absent Rust serving layer.

See ``SURVEY.md`` at the repo root for the full map from reference components
to detax modules.
"""

__version__ = "0.1.0"
