from imitation_from_observation_tpu.baselines_tpil.discriminator import (
    ConvDiscriminator,
    DomainConfusionVelocityDiscriminator,
    MLPDiscriminator,
    gradient_reversal,
)
from imitation_from_observation_tpu.baselines_tpil.trainer import TpilTrainer

__all__ = [
    "ConvDiscriminator",
    "DomainConfusionVelocityDiscriminator",
    "MLPDiscriminator",
    "gradient_reversal",
    "TpilTrainer",
]
