"""The task suite: pusher / reacher / cleaner (sweep) / striker / thrower /
real pusher.

Each mirrors the corresponding reference env under ``gym/envs/mujoco/``
(pusher3dof.py, reacher3dof.py, cleaner_env.py, striker.py, thrower.py,
pusher3dofreal.py): same observation layout, same context randomization, same
``reward_true`` convention (0 everywhere except the final step, where it is
``final_dist / initial_dist`` as a negative ratio), and a native reward of 0
— progress is judged from rendered frames by the reward engine.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from imitation_from_observation_tpu.sim.base import MujocoTask


class Pusher3DOF(MujocoTask):
    """3-link arm pushes a puck to a goal (reference pusher3dof.py)."""

    ASSET = "pusher3dof.xml"

    def _task_step(self, a: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        pobj = self.body_com("object")
        pgoal = self.body_com("goal")
        reward_dist = -float(np.linalg.norm(pgoal - pobj))
        reward_ctrl = -float(np.square(a).sum())
        self.do_simulation(a, self.frame_skip)
        reward_true = 0.0
        if self.itr == 0:
            self.reward_orig = -reward_dist
        if self.itr == self.config.horizon - 1:
            reward_true = reward_dist / self.reward_orig
        return self._get_obs(), dict(
            reward_true=reward_true, dense_reward=reward_dist + 0.001 * reward_ctrl
        )

    def reset_model(self) -> np.ndarray:
        qpos = self.rng.uniform(-0.1, 0.1, self.model.nq) + self.init_qpos
        while True:
            obj = np.array([self.rng.uniform(-1.0, -0.4), self.rng.uniform(0.3, 1.2)])
            goal = np.array([self.rng.uniform(-1.2, -0.8), self.rng.uniform(0.8, 1.2)])
            if np.linalg.norm(obj - goal) > 0.45:
                break
        if self.config.object_pos is not None:
            obj = np.asarray(self.config.object_pos)
        if self.config.goal is not None:
            goal = np.asarray(self.config.goal)
        self.object = obj
        self.goal = goal
        self.randomize_distractors()
        qpos[-4:-2] = obj
        qpos[-2:] = goal
        qvel = self.init_qvel.copy()
        qvel[-4:] = 0
        self.set_state(qpos, qvel)
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        # qpos/qvel minus the object+goal slide dofs (pusher3dof.py:129-134);
        # proprioceptive-only so visual reward carries the task signal.
        # config.full_state switches to the tpil/inceptionsame variant the
        # reference's shipped experts were trained on.
        if self.config.full_state:
            return self.full_state_obs()
        return np.concatenate(
            [self.data.qpos.flat[:-4], self.data.qvel.flat[:-4]]
        ).astype(np.float32)

    def full_state_obs(self) -> np.ndarray:
        """TPIL/inceptionsame obs variant with effector/object/goal positions
        (pusher3dof.py:121-127)."""
        return np.concatenate(
            [
                self.data.qpos.flat[:-4],
                self.data.qvel.flat[:-4],
                self.body_com("distal_4"),
                self.body_com("object"),
                self.body_com("goal"),
            ]
        ).astype(np.float32)


class Reacher3DOF(MujocoTask):
    """3-link arm reaches a goal marker; bg/arm colors randomized
    (reference reacher3dof.py)."""

    ASSET = "reacher3dof.xml"

    def _task_step(self, a: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        parm = self.body_com("distal_4")
        pgoal = self.body_com("goal")
        reward_dist = -float(np.linalg.norm(parm - pgoal))
        reward_ctrl = -float(np.square(a).sum())
        self.do_simulation(a, self.frame_skip)
        reward_true = 0.0
        if self.itr == 0:
            self.reward_orig = -reward_dist
        if self.itr == self.config.horizon - 1:
            reward_true = reward_dist / self.reward_orig
        return self._get_obs(), dict(
            reward_true=reward_true, dense_reward=reward_dist + 0.001 * reward_ctrl
        )

    def reset_model(self) -> np.ndarray:
        qpos = self.rng.uniform(-0.1, 0.1, self.model.nq) + self.init_qpos
        bgcolor = (
            np.asarray(self.config.bgcolor)
            if self.config.bgcolor is not None
            else self.random_color()
        )
        armcolor = self.random_color()
        while np.linalg.norm(bgcolor - armcolor) < 0.5:
            armcolor = np.concatenate([self.rng.uniform(0, 1, 3), [1.0]])
        if self.config.armcolor is not None:
            armcolor = np.asarray(self.config.armcolor)
        self.model.geom_rgba[self.geom_id("bg")] = bgcolor
        for i in range(7):
            self.model.geom_rgba[self.geom_id(f"arm{i}")] = armcolor
        self.randomize_distractors()
        if self.config.goal is not None:
            goal = np.asarray(self.config.goal)
        else:
            goal = np.array([self.rng.uniform(-1.1, -0.5), self.rng.uniform(0.5, 1.1)])
        self.goal = goal
        qpos[-2:] = goal
        qvel = self.init_qvel.copy()
        qvel[-4:] = 0
        self.set_state(qpos, qvel)
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        if self.config.full_state:
            return self.full_state_obs()
        return np.concatenate(
            [self.data.qpos.flat[:-4], self.data.qvel.flat[:-4]]
        ).astype(np.float32)

    def full_state_obs(self) -> np.ndarray:
        return np.concatenate(
            [
                self.data.qpos.flat[:-4],
                self.data.qvel.flat[:-4],
                self.body_com("distal_4"),
                self.body_com("goal"),
            ]
        ).astype(np.float32)


class Cleaner(MujocoTask):
    """Sweeping: push five pucks toward the goal strip (reference
    cleaner_env.py). Frames are 36x64 (wide viewer)."""

    ASSET = "cleaner.xml"

    def _task_step(self, a: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        parm = self.body_com("distal_4")
        pgoal = self.body_com("goal")
        objs = [self.body_com(f"object{i}") for i in range(5)]
        true_reward = -sum(float(np.linalg.norm(o - pgoal)) for o in objs)
        reward_touch = -sum(float(np.linalg.norm(parm - o)) for o in objs)
        diff_x = -abs(
            float(self.site_pos("tip_arml")[1]) - float(self.site_pos("tip_armr")[1])
        )
        reward_ctrl = -float(np.square(a).sum())
        dense = true_reward + reward_touch + 10 * diff_x + 0.001 * reward_ctrl
        if self.itr == 0:
            self.reward_orig = -true_reward
        true_reward /= self.reward_orig
        self.do_simulation(a, self.frame_skip)
        reward_true = true_reward if self.itr == self.config.horizon - 1 else 0.0
        return self._get_obs(), dict(reward_true=reward_true, dense_reward=dense)

    def camera_pose(self, vp: int = 0):
        return np.zeros(3), 4.0, -45.0, self._azimuth(vp)

    def reset_model(self) -> np.ndarray:
        self.set_state(self.init_qpos.copy(), self.init_qvel.copy())
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        return np.concatenate([self.data.qpos.flat, self.data.qvel.flat]).astype(np.float32)


class Striker(MujocoTask):
    """7-DOF arm strikes a ball toward a goal; supports multi-viewpoint
    rendering via ``n_viewpoints`` (reference striker.py:52-67)."""

    ASSET = "striker.xml"

    def __init__(self, config=None):
        super().__init__(config)
        self._striked = False
        self._min_strike_dist = np.inf
        self.strike_threshold = 0.2

    def _task_step(self, a: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        vec1 = self.body_com("object") - self.body_com("r_wrist_flex_link")
        vec2 = self.body_com("object") - self.body_com("goal")
        self._min_strike_dist = min(self._min_strike_dist, float(np.linalg.norm(vec2)))
        if np.linalg.norm(vec1) < self.strike_threshold and not self._striked:
            self._striked = True
            self._strike_pos = self.body_com("r_wrist_flex_link")
        if self._striked:
            reward_near = -float(np.linalg.norm(self.body_com("r_wrist_flex_link") - self._strike_pos))
        else:
            reward_near = -float(np.linalg.norm(vec1))
        reward_dist = -self._min_strike_dist
        reward_ctrl = -float(np.square(a).sum())
        self.do_simulation(a, self.frame_skip)
        actual_dist = float(np.linalg.norm(vec2))
        reward_true = 0.0
        if self.itr == 0:
            self.reward_orig = actual_dist
        if self.itr == self.config.horizon - 1:
            reward_true = -actual_dist / self.reward_orig
        return self._get_obs(), dict(
            reward_dist=reward_dist,
            reward_ctrl=reward_ctrl,
            reward_true=reward_true,
            dense_reward=3 * reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near,
        )

    def camera_pose(self, vp: int = 0):
        elev = -45.0
        if self.config.view_angle is not None:
            va = self.config.view_angle
            elev = -float(va if np.isscalar(va) else va[vp])
        return np.array([0.0, 0.2, 0.0]), 2.5, elev, self._azimuth(vp)

    def reset_model(self) -> np.ndarray:
        self.itr = 0
        self._min_strike_dist = np.inf
        self._striked = False
        self._strike_pos = None
        qpos = self.init_qpos.copy()
        self.ball = np.array([0.5, -0.175])
        self.goal = np.asarray(self.config.goal) if self.config.goal is not None else np.array([0.7, 1.1])
        qpos[-9:-7] = [self.ball[1], self.ball[0]]
        qpos[-7:-5] = self.goal
        diff = self.ball - self.goal
        angle = -np.arctan(diff[0] / (diff[1] + 1e-8))
        qpos[-1] = angle / 3.14
        qvel = self.init_qvel + self.rng.uniform(-0.1, 0.1, self.model.nv)
        qvel[7:] = 0
        self.set_state(qpos, qvel)
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        return np.concatenate(
            [
                self.data.qpos.flat[:7],
                self.data.qvel.flat[:7],
                self.body_com("r_wrist_flex_link"),
                self.body_com("object"),
                self.body_com("goal"),
            ]
        ).astype(np.float32)


class Thrower(MujocoTask):
    """7-DOF arm throws a ball to a goal marker (reference thrower.py)."""

    ASSET = "thrower.xml"

    def __init__(self, config=None):
        super().__init__(config)
        self._ball_hit_ground = False
        self._ball_hit_location = None

    def _task_step(self, a: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        ball_xy = self.body_com("ball")[:2]
        goal_xy = self.body_com("goal")[:2]
        if not self._ball_hit_ground and self.body_com("ball")[2] < -0.25:
            self._ball_hit_ground = True
            self._ball_hit_location = self.body_com("ball")
        if self._ball_hit_ground:
            reward_dist = -float(np.linalg.norm(self._ball_hit_location[:2] - goal_xy))
        else:
            reward_dist = -float(np.linalg.norm(ball_xy - goal_xy))
        reward_ctrl = -float(np.square(a).sum())
        self.do_simulation(a, self.frame_skip)
        reward_actual = -float(np.linalg.norm(ball_xy - goal_xy))
        reward_true = 0.0
        if self.itr == 0:
            self.reward_orig = -reward_actual
        if self.itr == self.config.horizon - 1:
            reward_true = reward_actual / self.reward_orig
        return self._get_obs(), dict(
            reward_dist=reward_dist,
            reward_ctrl=reward_ctrl,
            reward_true=reward_true,
            dense_reward=reward_dist + 0.002 * reward_ctrl,
        )

    def camera_pose(self, vp: int = 0):
        return np.array([0.0, 0.2, 0.0]), 2.5, -45.0, self._azimuth(vp)

    def reset_model(self) -> np.ndarray:
        self._ball_hit_ground = False
        self._ball_hit_location = None
        qpos = self.init_qpos.copy()
        goal = (
            np.asarray(self.config.goal)
            if self.config.goal is not None
            else np.array([self.rng.uniform(-0.3, 0.3), self.rng.uniform(-0.3, 0.3)])
        )
        self.goal = goal
        qpos[-9:-7] = goal
        qvel = self.init_qvel + self.rng.uniform(-0.005, 0.005, self.model.nv)
        qvel[7:] = 0
        self.set_state(qpos, qvel)
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        return np.concatenate(
            [
                self.data.qpos.flat[:7],
                self.data.qvel.flat[:7],
                self.body_com("r_wrist_roll_link"),
                self.body_com("ball"),
                self.body_com("goal"),
            ]
        ).astype(np.float32)


class Pusher3DOFReal(Pusher3DOF):
    """Pusher with the real-camera-matched scene: fixed contexts from config,
    camera distance/elevation knobs (reference pusher3dofreal.py:44-63)."""

    ASSET = "pusher3dofreal.xml"

    def camera_pose(self, vp: int = 0):
        dist = self.config.cam_dist if self.config.cam_dist is not None else 3.0
        elev = (
            -float(self.config.view_angle)
            if self.config.view_angle is not None and np.isscalar(self.config.view_angle)
            else -45.0
        )
        az = 0.0 if self.config.viewpoint is None else self._azimuth(vp)
        lookat = np.array([0.0, float(self.object[0]) if hasattr(self, "object") else 0.0, 0.0])
        return lookat, dist, elev, az

    def reset_model(self) -> np.ndarray:
        qpos = self.init_qpos.copy()
        qpos[0], qpos[1], qpos[2] = 1.7, 3.0, 1.5
        if self.config.goal is not None:
            if self.config.object_pos is None:
                raise ValueError(
                    "pusher3dofreal: config.goal is set but config.object_pos is "
                    "None — the real-scene task needs both fixed positions"
                )
            self.object = np.asarray(self.config.object_pos, np.float64)
            self.goal = np.asarray(self.config.goal, np.float64)
        else:
            self.object = np.zeros(2)
            self.goal = np.zeros(2)
        qpos[-4:-2] = self.object
        qpos[-2:] = self.goal
        qvel = self.init_qvel.copy()
        qvel[-4:] = 0
        self.set_state(qpos, qvel)
        return self._get_obs()
