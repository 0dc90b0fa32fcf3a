"""Vectorized environment executor.

The JAX-shaped rollout runtime: N env copies stepped in lockstep with one
batched policy call per step (the reference's ``VecEnvExecutor``,
sandbox/rocky/tf/envs/vec_env_executor.py:8-47, with auto-reset). With MuJoCo
stepping being native and the policy being a jitted batched forward, this
replaces the reference's N-process ``StatefulPool`` pickle machinery.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np


class VecEnv:
    def __init__(self, env_fns: Sequence[Callable[[], Any]], max_path_length: int | None = None):
        self.envs = [fn() for fn in env_fns]
        self.n_envs = len(self.envs)
        self.max_path_length = max_path_length
        self._steps = np.zeros(self.n_envs, np.int64)
        self.action_space = self.envs[0].action_space
        self.observation_space = self.envs[0].observation_space

    def seed(self, seed: int) -> None:
        for i, env in enumerate(self.envs):
            env.seed(seed + i)

    def reset(self) -> np.ndarray:
        self._steps[:] = 0
        return np.stack([env.reset() for env in self.envs])

    def step(self, actions: np.ndarray):
        obs, rewards, dones, infos = [], [], [], []
        for i, (env, a) in enumerate(zip(self.envs, actions)):
            o, r, d, info = env.step(a)
            self._steps[i] += 1
            if self.max_path_length is not None and self._steps[i] >= self.max_path_length:
                d = True
            if d:
                o = env.reset()
                self._steps[i] = 0
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(info)
        return np.stack(obs), np.asarray(rewards, np.float64), np.asarray(dones), infos

    def close(self) -> None:
        for env in self.envs:
            if hasattr(env, "close"):
                env.close()
