from imitation_from_observation_tpu.exp.variants import VariantGenerator
from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos, record_rollout
from imitation_from_observation_tpu.exp.train_expert import train_expert

__all__ = [
    "VariantGenerator",
    "generate_demo_videos",
    "record_rollout",
    "train_expert",
]
