"""Training runtime (L4): unified multi-task trainer + optimizer factory."""

from jen1_tpu.train.optim import make_optimizer  # noqa: F401
from jen1_tpu.train.trainer import TrainState, UnifiedMultiTaskTrainer  # noqa: F401
