"""Training: Trainer, train loop, checkpoints."""

from ddsp_tpu.train.trainer import Trainer  # noqa: F401
from ddsp_tpu.train.trainer import TrainState  # noqa: F401
from ddsp_tpu.train.train_loop import MetricsWriter  # noqa: F401
from ddsp_tpu.train.train_loop import train  # noqa: F401
