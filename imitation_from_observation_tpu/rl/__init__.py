from imitation_from_observation_tpu.rl.baselines import LinearFeatureBaseline, ZeroBaseline
from imitation_from_observation_tpu.rl.nn_baseline import (
    GaussianConvBaseline,
    GaussianMLPBaseline,
)
from imitation_from_observation_tpu.rl.gae import discount_cumsum, process_paths
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy
from imitation_from_observation_tpu.rl.device_rollout import DeviceSampler
from imitation_from_observation_tpu.rl.sampler import VectorizedSampler, rollout
from imitation_from_observation_tpu.rl.trpo import TRPO
from imitation_from_observation_tpu.rl.vpg import VPG
from imitation_from_observation_tpu.rl.algo import BatchPolopt
from imitation_from_observation_tpu.rl.ppo import PPO
from imitation_from_observation_tpu.rl.erwr import ERWR
from imitation_from_observation_tpu.rl.reps import REPS
from imitation_from_observation_tpu.rl.ddpg import DDPG
from imitation_from_observation_tpu.rl.evolution import CEM, CMAES
from imitation_from_observation_tpu.rl.optimizers import (
    FirstOrderOptimizer,
    HessianFreeOptimizer,
    LbfgsOptimizer,
    PenaltyLbfgsOptimizer,
)
from imitation_from_observation_tpu.rl.policies_extra import (
    CategoricalGRUPolicy,
    CategoricalLSTMPolicy,
    CategoricalMLPPolicy,
    GaussianConvPolicy,
    GaussianGRUPolicy,
    GaussianLSTMPolicy,
)
from imitation_from_observation_tpu.rl.regressors import (
    BernoulliMLPRegressor,
    CategoricalMLPRegressor,
    DeterministicMLPRegressor,
    GaussianMLPRegressor,
)
from imitation_from_observation_tpu.rl.spaces import Box, Discrete, Product


def TNPG(policy, **kwargs):
    """Truncated natural policy gradient (reference rllab/algos/tnpg.py):
    TRPO's CG direction taken without backtracking (one full step)."""
    kwargs.setdefault("max_backtracks", 1)
    kwargs.setdefault("accept_violation", True)
    return TRPO(policy, **kwargs)


class NOP:
    """No-op optimizer (reference rllab/algos/nop.py) — for debugging loops."""

    def optimize(self, samples):
        return {}

__all__ = [
    "LinearFeatureBaseline",
    "ZeroBaseline",
    "discount_cumsum",
    "process_paths",
    "GaussianMLPPolicy",
    "DeviceSampler",
    "VectorizedSampler",
    "rollout",
    "TRPO",
    "VPG",
    "BatchPolopt",
    "PPO",
    "ERWR",
    "REPS",
    "DDPG",
    "CEM",
    "CMAES",
    "TNPG",
    "NOP",
    "FirstOrderOptimizer",
    "LbfgsOptimizer",
    "PenaltyLbfgsOptimizer",
    "HessianFreeOptimizer",
    "Box",
    "Discrete",
    "Product",
    "CategoricalMLPPolicy",
    "CategoricalGRUPolicy",
    "CategoricalLSTMPolicy",
    "GaussianGRUPolicy",
    "GaussianLSTMPolicy",
    "GaussianConvPolicy",
    "GaussianMLPRegressor",
    "DeterministicMLPRegressor",
    "CategoricalMLPRegressor",
    "BernoulliMLPRegressor",
]
