from nbss_tpu.train.module import TrainModule
from nbss_tpu.train.loop import Trainer
from nbss_tpu.train.optim import build_optimizer, LRSchedule
from nbss_tpu.train.ckpt import CheckpointManager

__all__ = ["TrainModule", "Trainer", "build_optimizer", "LRSchedule", "CheckpointManager"]
