from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    RewardConfig,
    RLConfig,
    TranslationModelConfig,
    TrainConfig,
)
from imitation_from_observation_tpu.core.log import Logger, get_logger
from imitation_from_observation_tpu.core.rng import RngStream

__all__ = [
    "EnvConfig",
    "ExperimentConfig",
    "RewardConfig",
    "RLConfig",
    "TranslationModelConfig",
    "TrainConfig",
    "Logger",
    "get_logger",
    "RngStream",
]
