from imitation_from_observation_tpu.models.context import (
    ContextFeat,
    ContextSkip,
    ContextSmall,
    TranslationOutputs,
)
from imitation_from_observation_tpu.models.losses import translation_loss
from imitation_from_observation_tpu.models.zoo import build_model, MODEL_REGISTRY
from imitation_from_observation_tpu.models.inception_family import (
    InceptionResnetV2,
    InceptionV4,
)
from imitation_from_observation_tpu.models.backbones_extra import (
    AlexNetV2,
    CifarNet,
    InceptionV1,
    InceptionV2,
    LeNet,
    OverFeat,
    ResNetV1,
    ResNetV2,
    VGG,
    VGG16,
    make_backbone,
)

__all__ = [
    "ContextFeat",
    "ContextSkip",
    "ContextSmall",
    "TranslationOutputs",
    "translation_loss",
    "build_model",
    "MODEL_REGISTRY",
    "AlexNetV2",
    "CifarNet",
    "InceptionV1",
    "InceptionV2",
    "InceptionV4",
    "InceptionResnetV2",
    "LeNet",
    "OverFeat",
    "ResNetV1",
    "ResNetV2",
    "VGG",
    "VGG16",
    "make_backbone",
]
