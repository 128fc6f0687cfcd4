"""Checkpoint lifecycle (L5): orbax-backed save/restore + torch import."""

from jen1_tpu.ckpt.checkpoint import CheckpointManager  # noqa: F401
from jen1_tpu.ckpt.torch_import import convert_reference_unet  # noqa: F401
