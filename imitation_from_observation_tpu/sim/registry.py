"""Environment registry (replaces the gym fork's registration of
Pusher3DOF-v1 / Reacher3DOF-v1 / Cleaner-v1 / Striker-v0 / Thrower-v0 /
Pusher3DOFReal-v1, reference gym/envs/__init__.py:259-284)."""

from __future__ import annotations

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.sim.tasks import (
    Cleaner,
    Pusher3DOF,
    Pusher3DOFReal,
    Reacher3DOF,
    Striker,
    Thrower,
)

from imitation_from_observation_tpu.sim.classic import (
    CartpoleEnv,
    CartpoleSwingupEnv,
    DoublePendulumEnv,
    MountainCarEnv,
)
from imitation_from_observation_tpu.sim.point_env import PointEnv

ENV_REGISTRY = {
    "pusher3dof": Pusher3DOF,
    "reacher3dof": Reacher3DOF,
    "cleaner": Cleaner,
    "striker": Striker,
    "thrower": Thrower,
    "pusher3dofreal": Pusher3DOFReal,
    "point": PointEnv,
    "cartpole": CartpoleEnv,
    "cartpole_swingup": CartpoleSwingupEnv,
    "mountain_car": MountainCarEnv,
    "double_pendulum": DoublePendulumEnv,
}

# cheap non-MuJoCo test/example envs (dense reward, no frames) — everything
# else follows the visual-imitation task contract (reward 0 until the final
# step, reward_true in info, odd-step frames)
TEST_ENVS = {"point", "cartpole", "cartpole_swingup", "mountain_car", "double_pendulum"}


def make_env(name: str | None = None, config: EnvConfig | None = None):
    config = config or EnvConfig(name=name or "pusher3dof")
    key = name or config.name
    if key not in ENV_REGISTRY:
        raise KeyError(f"unknown env {key!r}; have {sorted(ENV_REGISTRY)}")
    return ENV_REGISTRY[key](config)
