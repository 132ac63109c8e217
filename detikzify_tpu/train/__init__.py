from .pretrain import pretrain
from .train import train
from .step import (TrainState, init_state, make_optimizer, make_train_step,
                   trainable_mask)
from .trainer import TrainConfig, Trainer
from .checkpoint import Checkpointer, get_last_checkpoint, save_params_npz

__all__ = ["pretrain", "train", "TrainState", "init_state", "make_optimizer",
           "make_train_step", "trainable_mask", "TrainConfig", "Trainer",
           "Checkpointer", "get_last_checkpoint", "save_params_npz"]
