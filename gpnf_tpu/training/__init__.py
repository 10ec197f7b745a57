from .checkpoints import CheckpointManager
from .loop import TrainConfig, train, save_sample_grid, evaluate
from .schedules import linear_warmup, multistep_restart, cosine_restart

__all__ = ["CheckpointManager", "TrainConfig", "train", "save_sample_grid",
           "evaluate", "linear_warmup", "multistep_restart", "cosine_restart"]
