"""Training: jitted steps, schedules, checkpointing, configuration."""

from .callbacks import (Callback, HistoryCallback, LossCurveCallback,
                        MemoryMonitorCallback, ReconstructionPlotCallback)
from .checkpoint import Checkpointer, transfer_params
from .classifier import ClassifierConfig, ClassifierTrainer, train_and_test_folds
from .config import (CheckpointConfig, DatasetConfig, ModelConfig, RunConfig,
                     load_config, save_config)
from .schedules import beta_schedule, cosine_warm_restarts, make_optimizer
from .trainer import Trainer, TrainerConfig, TrainState

__all__ = [
    "Callback", "HistoryCallback", "LossCurveCallback",
    "MemoryMonitorCallback", "ReconstructionPlotCallback",
    "Checkpointer", "transfer_params",
    "ClassifierConfig", "ClassifierTrainer", "train_and_test_folds",
    "CheckpointConfig", "DatasetConfig", "ModelConfig", "RunConfig",
    "load_config", "save_config",
    "beta_schedule", "cosine_warm_restarts", "make_optimizer",
    "Trainer", "TrainerConfig", "TrainState",
]
