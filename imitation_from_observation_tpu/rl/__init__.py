from imitation_from_observation_tpu.rl.baselines import LinearFeatureBaseline, ZeroBaseline
from imitation_from_observation_tpu.rl.gae import discount_cumsum, process_paths
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy
from imitation_from_observation_tpu.rl.sampler import VectorizedSampler, rollout
from imitation_from_observation_tpu.rl.trpo import TRPO
from imitation_from_observation_tpu.rl.vpg import VPG
from imitation_from_observation_tpu.rl.algo import BatchPolopt

__all__ = [
    "LinearFeatureBaseline",
    "ZeroBaseline",
    "discount_cumsum",
    "process_paths",
    "GaussianMLPPolicy",
    "VectorizedSampler",
    "rollout",
    "TRPO",
    "VPG",
    "BatchPolopt",
]
