"""Native vectorized rollouts: N task sims on the C++ batched stepper.

For reward modes that need no rendering (oracle reward splice, dense-reward
expert training — the demo-generation leg of the pipeline), the whole env
step is state math: MuJoCo stepping + body-COM distances + qpos slicing.
This backend runs all of it batched — one GIL-free C call for physics, one
vectorized numpy pass for observations/rewards — replacing N python
``env.step`` dispatches per vec-step.

Semantics match ``sim/tasks.py`` (same MJCF, same obs layout, same
``reward_true``/dense-reward conventions, same reset distributions); the
parity test steps both backends from identical states and controls.
Actions arrive in [-1, 1] (NormalizedEnv semantics built in).
"""

from __future__ import annotations

import os

import mujoco
import numpy as np

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.sim.base import _ASSET_DIR, Box
from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim


class _NativeArmVecBase:
    """Shared machinery for the 3-link arm tasks (pusher/reacher)."""

    ASSET = ""

    def __init__(self, n_envs: int, config: EnvConfig | None = None, max_path_length: int | None = None):
        self.config = config or EnvConfig()
        self.n_envs = n_envs
        xml = os.path.join(_ASSET_DIR, self.ASSET)
        self.sim = NativeBatchSim(xml, n_envs)
        # a python-side model only for ids/ranges/initial state
        self._m = mujoco.MjModel.from_xml_path(xml)
        self._init_qpos = np.zeros(self._m.nq)
        self._init_qvel = np.zeros(self._m.nv)
        self._bid = {
            name: mujoco.mj_name2id(self._m, mujoco.mjtObj.mjOBJ_BODY, name)
            for name in ("object", "goal", "distal_4")
        }
        ctrl = self._m.actuator_ctrlrange.astype(np.float64)
        self._ctrl_lo, self._ctrl_hi = ctrl[:, 0], ctrl[:, 1]
        self.max_path_length = max_path_length or self.config.horizon
        self.rng = np.random.default_rng(self.config.seed)
        self.itr = 0
        self._reward_orig = np.ones(n_envs)
        nu = self.sim.nu
        self.action_space = Box(-np.ones(nu), np.ones(nu))
        obs_dim = (self._m.nq - 4) + (self._m.nv - 4)
        inf = np.full(obs_dim, np.inf, np.float32)
        self.observation_space = Box(-inf, inf)

    def seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)

    # -- task hooks ---------------------------------------------------------
    def _sample_qpos(self) -> np.ndarray:
        raise NotImplementedError

    def _distances(self) -> np.ndarray:
        raise NotImplementedError

    def reset(self) -> np.ndarray:
        qpos = self._sample_qpos()
        qvel = np.tile(self._init_qvel, (self.n_envs, 1))
        qvel[:, -4:] = 0
        self.sim.set_state(qpos, qvel)
        self.itr = 0
        return self._obs()

    def _obs(self) -> np.ndarray:
        qpos, qvel = self.sim.get_state()
        return np.concatenate([qpos[:, :-4], qvel[:, :-4]], axis=1).astype(np.float32)

    def step(self, actions: np.ndarray):
        # NormalizedEnv action rescale [-1,1] -> ctrlrange, clipped
        a = np.clip(np.asarray(actions, np.float64), -1, 1)
        ctrl = self._ctrl_lo + (a + 1.0) * 0.5 * (self._ctrl_hi - self._ctrl_lo)
        dist = self._distances()  # pre-step, like the python envs
        if self.itr == 0:
            self._reward_orig = dist.copy()
        self.sim.step(ctrl, self.config.frame_skip)
        # ctrl penalty over the SCALED action, like the python envs (they see
        # the post-NormalizedEnv control)
        reward_ctrl = -np.square(ctrl).sum(axis=1)
        dense = -dist + 0.001 * reward_ctrl
        final = self.itr == self.config.horizon - 1
        reward_true = (-dist / self._reward_orig) if final else np.zeros(self.n_envs)
        self.itr += 1
        done = self.itr >= self.max_path_length
        obs = self._obs()
        if done:
            obs = self.reset()
        rewards = dense if self.config.dense_reward else np.zeros(self.n_envs)
        infos = [
            dict(reward_true=float(reward_true[i]), frames=None) for i in range(self.n_envs)
        ]
        return obs, rewards, np.full(self.n_envs, done), infos

    def close(self) -> None:
        self.sim.close()


class NativePusherVec(_NativeArmVecBase):
    """Pusher3DOF on the native stepper (object->goal distance)."""

    ASSET = "pusher3dof.xml"

    def _sample_qpos(self) -> np.ndarray:
        n = self.n_envs
        qpos = self._init_qpos + self.rng.uniform(-0.1, 0.1, (n, self._m.nq))
        for i in range(n):
            while True:
                obj = np.array([self.rng.uniform(-1.0, -0.4), self.rng.uniform(0.3, 1.2)])
                goal = np.array([self.rng.uniform(-1.2, -0.8), self.rng.uniform(0.8, 1.2)])
                if np.linalg.norm(obj - goal) > 0.45:
                    break
            qpos[i, -4:-2] = obj
            qpos[i, -2:] = goal
        return qpos

    def _distances(self) -> np.ndarray:
        obj = self.sim.subtree_com(self._bid["object"])
        goal = self.sim.subtree_com(self._bid["goal"])
        return np.linalg.norm(goal - obj, axis=1)


class NativeReacherVec(_NativeArmVecBase):
    """Reacher3DOF on the native stepper (effector->goal distance)."""

    ASSET = "reacher3dof.xml"

    def _sample_qpos(self) -> np.ndarray:
        n = self.n_envs
        qpos = self._init_qpos + self.rng.uniform(-0.1, 0.1, (n, self._m.nq))
        qpos[:, -2] = self.rng.uniform(-1.1, -0.5, n)
        qpos[:, -1] = self.rng.uniform(0.5, 1.1, n)
        return qpos

    def _distances(self) -> np.ndarray:
        arm = self.sim.subtree_com(self._bid["distal_4"])
        goal = self.sim.subtree_com(self._bid["goal"])
        return np.linalg.norm(goal - arm, axis=1)
