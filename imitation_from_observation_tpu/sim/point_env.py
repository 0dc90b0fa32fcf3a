"""2-D point-mass environment (the rllab example env,
rllab/envs/point_env.py pattern): action = bounded velocity, reward =
-|pos|. Used for fast algorithm tests and examples — no MuJoCo needed."""

from __future__ import annotations

import numpy as np

from imitation_from_observation_tpu.sim.base import Box


class PointEnv:
    def __init__(self, config=None, seed: int = 0):
        if config is not None:
            seed = config.seed
        self.rng = np.random.default_rng(seed)
        self.action_space = Box(-np.ones(2) * 0.25, np.ones(2) * 0.25)
        self.observation_space = Box(-np.full(2, np.inf), np.full(2, np.inf))
        self.pos = np.zeros(2)

    def seed(self, s: int) -> None:
        self.rng = np.random.default_rng(s)

    def reset(self) -> np.ndarray:
        self.pos = self.rng.uniform(-1, 1, 2)
        return self.pos.astype(np.float32)

    def step(self, a: np.ndarray):
        self.pos = self.pos + np.clip(a, self.action_space.low, self.action_space.high)
        reward = -float(np.linalg.norm(self.pos))
        return self.pos.astype(np.float32), reward, False, {}

    def close(self) -> None:
        pass
