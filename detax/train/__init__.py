"""Training: optimizer state, jitted data-parallel step, on-device
augmentation, checkpointing, PyTorch weight import.

The reference ships **no** training loop (SURVEY.md §0); this tier implements
the intended capability (RPN + Fast R-CNN losses exist in the reference,
``rpn.py:187-244``) the TPU way: one jitted step over a device mesh, metrics
returned as arrays (no host callbacks), Orbax checkpoints with full train
state (vs the reference's weights-only ``BaseModel.save``,
``models/base.py:47-60``).
"""

from detax.train.train_state import TrainState, create_train_state
from detax.train.step import make_train_step, make_eval_step
from detax.train.augment import augment_batch
from detax.train.checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "augment_batch",
    "CheckpointManager",
]
