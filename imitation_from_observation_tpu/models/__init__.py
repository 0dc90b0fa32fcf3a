from imitation_from_observation_tpu.models.context import (
    ContextFeat,
    ContextSkip,
    ContextSmall,
    TranslationOutputs,
)
from imitation_from_observation_tpu.models.losses import translation_loss
from imitation_from_observation_tpu.models.zoo import build_model, MODEL_REGISTRY

__all__ = [
    "ContextFeat",
    "ContextSkip",
    "ContextSmall",
    "TranslationOutputs",
    "translation_loss",
    "build_model",
    "MODEL_REGISTRY",
]
