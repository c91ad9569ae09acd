"""Training core: loop, optimizer/schedules, metrics, checkpoints, logging."""

from nnue_vision_tpu.training.metrics import compute_metrics  # noqa: F401
from nnue_vision_tpu.training.optim import create_optimizer, get_lr  # noqa: F401
