from imitation_from_observation_tpu.sim.base import MujocoTask
from imitation_from_observation_tpu.sim.pooled_vec import (
    NativeFrameVecEnv,
    make_vec_env,
    native_render_available,
)
from imitation_from_observation_tpu.sim.native_tasks import (
    NATIVE_VEC_TASKS,
    NativeVecTask,
    make_native_vec,
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
    "NativeVecTask",
    "NATIVE_VEC_TASKS",
    "make_native_vec",
    "make_vec_env",
    "native_render_available",
]
