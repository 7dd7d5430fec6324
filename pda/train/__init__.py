"""Training: per-algorithm jitted steps, engine, optimizer, checkpointing."""

from .checkpoint import (
    BEST,
    LATEST,
    checkpoint_dir,
    checkpoint_exists,
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from .engine import (
    AdaMatchTrainer,
    AdaMTTrainer,
    FixMatchTrainer,
    MeanTeacherTrainer,
    PseudoTrainer,
    PseudoTrainerPUNet,
    PUNetTrainer,
    Trainer,
    UNetTrainer,
)
from .logging import (
    AdaMatchLogger,
    AdaMTLogger,
    FixMatchLogger,
    MeanTeacherLogger,
    PseudoLogger,
    PUNetLogger,
    TrainLogger,
    make_grid,
)
from .optim import ReduceLROnPlateau, adam
from .profiling import Throughput, trace
from .state import TrainState, create_train_state, punet_l2_reg

__all__ = [
    "Trainer",
    "UNetTrainer",
    "PUNetTrainer",
    "PseudoTrainer",
    "PseudoTrainerPUNet",
    "MeanTeacherTrainer",
    "FixMatchTrainer",
    "AdaMTTrainer",
    "AdaMatchTrainer",
    "TrainState",
    "create_train_state",
    "punet_l2_reg",
    "adam",
    "ReduceLROnPlateau",
    "TrainLogger",
    "PUNetLogger",
    "PseudoLogger",
    "MeanTeacherLogger",
    "FixMatchLogger",
    "AdaMTLogger",
    "AdaMatchLogger",
    "make_grid",
    "Throughput",
    "trace",
    "save_checkpoint",
    "load_checkpoint",
    "load_params",
    "checkpoint_dir",
    "checkpoint_exists",
    "BEST",
    "LATEST",
]
