from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import (
    build_device_data_train_step,
    build_eval_step,
    build_multi_train_step,
    build_train_step,
    init_model,
    make_forward,
)
from wmfml_tpu.train.trainer import ModelTrainer

__all__ = [
    "TrainState",
    "build_optimizer",
    "build_device_data_train_step",
    "build_eval_step",
    "build_multi_train_step",
    "build_train_step",
    "init_model",
    "make_forward",
    "ModelTrainer",
]
