"""Environment wrappers.

``NormalizedEnv`` mirrors reference ``rllab/envs/normalized_env.py:11-103``:
actions arrive in [-1, 1] and are rescaled to the env's control range
(clipped at the bounds); optional running z-normalization of observations and
scaling of rewards.
"""

from __future__ import annotations

import numpy as np

from imitation_from_observation_tpu.sim.base import Box


class RunningMeanStd:
    def __init__(self, shape: tuple[int, ...], alpha: float = 0.001):
        self.alpha = alpha
        self.mean = np.zeros(shape, np.float64)
        self.var = np.ones(shape, np.float64)

    def update(self, x: np.ndarray) -> None:
        self.mean = (1 - self.alpha) * self.mean + self.alpha * x
        self.var = (1 - self.alpha) * self.var + self.alpha * np.square(x - self.mean)

    def normalize(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / (np.sqrt(self.var) + 1e-8)


class NormalizedEnv:
    def __init__(
        self,
        env,
        scale_reward: float = 1.0,
        normalize_obs: bool = False,
        normalize_reward: bool = False,
        obs_alpha: float = 0.001,
        reward_alpha: float = 0.001,
    ):
        self.env = env
        self.scale_reward = scale_reward
        self._normalize_obs = normalize_obs
        self._normalize_reward = normalize_reward
        self._obs_rms = RunningMeanStd(env.observation_space.shape, obs_alpha)
        self._rew_rms = RunningMeanStd((), reward_alpha)
        n_act = env.action_space.flat_dim
        self.action_space = Box(-np.ones(n_act), np.ones(n_act))
        self.observation_space = env.observation_space

    def _apply_obs(self, obs: np.ndarray) -> np.ndarray:
        if self._normalize_obs:
            self._obs_rms.update(obs)
            return self._obs_rms.normalize(obs).astype(np.float32)
        return obs

    def reset(self) -> np.ndarray:
        return self._apply_obs(self.env.reset())

    def step(self, action: np.ndarray):
        lb, ub = self.env.action_space.low, self.env.action_space.high
        scaled = lb + (np.asarray(action) + 1.0) * 0.5 * (ub - lb)
        scaled = np.clip(scaled, lb, ub)
        obs, reward, done, info = self.env.step(scaled)
        if self._normalize_reward:
            self._rew_rms.update(reward)
            reward = self._rew_rms.normalize(reward)
        return self._apply_obs(obs), reward * self.scale_reward, done, info

    def __getattr__(self, name):
        return getattr(self.env, name)
