from imitation_from_observation_tpu.baselines_tpil.discriminator import (
    DomainConfusionVelocityDiscriminator,
    gradient_reversal,
)
from imitation_from_observation_tpu.baselines_tpil.trainer import TpilTrainer

__all__ = [
    "DomainConfusionVelocityDiscriminator",
    "gradient_reversal",
    "TpilTrainer",
]
