from imitation_from_observation_tpu.sim.base import MujocoTask
from imitation_from_observation_tpu.sim.pooled_vec import (
    NativeFrameVecEnv,
    make_vec_env,
    native_render_available,
)
from imitation_from_observation_tpu.sim.registry import ENV_REGISTRY, make_env
from imitation_from_observation_tpu.sim.vec_env import VecEnv
from imitation_from_observation_tpu.sim.wrappers import NormalizedEnv

__all__ = [
    "MujocoTask",
    "make_env",
    "ENV_REGISTRY",
    "VecEnv",
    "NormalizedEnv",
    "NativeFrameVecEnv",
    "make_vec_env",
    "native_render_available",
]
