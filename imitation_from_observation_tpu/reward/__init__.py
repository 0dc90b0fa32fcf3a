from imitation_from_observation_tpu.reward.engine import VisualRewardEngine

__all__ = ["VisualRewardEngine"]
