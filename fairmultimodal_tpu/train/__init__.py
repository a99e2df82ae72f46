"""Training layer: jitted/pjit train steps, plateau scheduling, early
stopping, threshold calibration, and the FAME dynamic-weight protocol.
"""

from fairmultimodal_tpu.train.loop import (
    TrainConfig,
    PlateauScheduler,
    EarlyStopper,
    FAMETrainer,
)
from fairmultimodal_tpu.train.calibrate import calibrate_thresholds
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig
from fairmultimodal_tpu.train.adversarial import (
    AdvConfig,
    adv_grid_search,
    train_adversarial,
)

__all__ = [
    "TrainConfig",
    "PlateauScheduler",
    "EarlyStopper",
    "FAMETrainer",
    "calibrate_thresholds",
    "MultitaskTrainer",
    "SimpleTrainConfig",
    "AdvConfig",
    "adv_grid_search",
    "train_adversarial",
]
