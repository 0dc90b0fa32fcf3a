"""Classic-control test environments (pure numpy, no physics library).

Capability match for the reference's Box2D env family
(``rllab/envs/box2d/{cartpole_env,cartpole_swingup_env,mountain_car_env,
double_pendulum_env}.py``), which exist there purely as cheap test/example
envs for the algorithm smoke matrix (reference tests/test_algos.py). The
Box2D engine itself is replaced by closed-form dynamics — same observation
layout, reset distributions, reward shapes, and done conditions:

- :class:`CartpoleEnv` — balance: reward ``notdone*10 - notdone*(1-cos th)
  - notdone*1e-5*u^2`` (cartpole_env.py:46-52), done at |x|>2.4 or |th|>0.2,
  reset uniform in ±0.05·bounds (cartpole_env.py:27-42).
- :class:`CartpoleSwingupEnv` — swing-up: reset with angle in [pi-1, pi+1],
  reward ``cos(th)`` while |x| <= 3, -100 on done (|x|>3)
  (cartpole_swingup_env.py:28-57).
- :class:`MountainCarEnv` — reward ``-1 + height_bonus*height``, done at
  x >= 0.6 (mountain_car_env.py:32-44); gym-classic hill dynamics.
- :class:`DoublePendulumEnv` — two-link pendulum, reward = -distance of tip
  from the upright target, never done (double_pendulum_env.py:52-62).
"""

from __future__ import annotations

import numpy as np

from imitation_from_observation_tpu.sim.base import Box


class _ClassicEnv:
    """Shared plumbing: seeded rng, Box spaces, step bookkeeping."""

    def __init__(self, config=None, seed: int = 0):
        if config is not None:
            seed = config.seed
        self.rng = np.random.default_rng(seed)

    def seed(self, s: int) -> None:
        self.rng = np.random.default_rng(s)

    def close(self) -> None:
        pass


class CartpoleEnv(_ClassicEnv):
    """Cart-pole balancing with force control."""

    max_pole_angle = 0.2
    max_cart_pos = 2.4
    max_cart_speed = 4.0
    max_pole_speed = 4.0
    reset_range = 0.05

    # classic cart-pole constants (Barto et al.); dt matches the reference's
    # 0.02 s Box2D timestep
    gravity, m_cart, m_pole, pole_l, dt = 9.8, 1.0, 0.1, 0.5, 0.02

    def __init__(self, config=None, seed: int = 0):
        super().__init__(config, seed)
        self.action_space = Box(np.array([-10.0]), np.array([10.0]))
        self.observation_space = Box(-np.full(4, np.inf), np.full(4, np.inf))
        self.state = np.zeros(4)  # x, xdot, theta, thetadot

    def reset(self) -> np.ndarray:
        bounds = np.array(
            [self.max_cart_pos, self.max_cart_speed, self.max_pole_angle, self.max_pole_speed]
        )
        self.state = self.rng.uniform(-self.reset_range * bounds, self.reset_range * bounds)
        return self.state.astype(np.float32)

    def _dynamics(self, force: float) -> None:
        x, xd, th, thd = self.state
        total_m = self.m_cart + self.m_pole
        pm_l = self.m_pole * self.pole_l
        sin, cos = np.sin(th), np.cos(th)
        tmp = (force + pm_l * thd**2 * sin) / total_m
        th_acc = (self.gravity * sin - cos * tmp) / (
            self.pole_l * (4.0 / 3.0 - self.m_pole * cos**2 / total_m)
        )
        x_acc = tmp - pm_l * th_acc * cos / total_m
        self.state = np.array(
            [x + self.dt * xd, xd + self.dt * x_acc, th + self.dt * thd, thd + self.dt * th_acc]
        )

    def _done(self) -> bool:
        return abs(self.state[0]) > self.max_cart_pos or abs(self.state[2]) > self.max_pole_angle

    def step(self, a):
        force = float(np.clip(np.asarray(a).reshape(-1)[0], -10.0, 10.0))
        self._dynamics(force)
        done = self._done()
        notdone = 1 - int(done)
        reward = notdone * 10.0 - notdone * (1 - np.cos(self.state[2])) - notdone * 1e-5 * force**2
        return self.state.astype(np.float32), float(reward), done, {}


class CartpoleSwingupEnv(CartpoleEnv):
    """Swing-up variant: start hanging, reward = cos(angle)."""

    max_cart_pos = 3.0
    max_reward_cart_pos = 3.0
    max_pole_angle = np.inf  # only the cart-position bound terminates

    def reset(self) -> np.ndarray:
        low = np.array([-1.0, -2.0, np.pi - 1.0, -3.0])
        high = np.array([1.0, 2.0, np.pi + 1.0, 3.0])
        self.state = self.rng.uniform(low, high)
        return self.state.astype(np.float32)

    def _done(self) -> bool:
        return abs(self.state[0]) > self.max_cart_pos

    def step(self, a):
        force = float(np.clip(np.asarray(a).reshape(-1)[0], -10.0, 10.0))
        self._dynamics(force)
        done = self._done()
        if done:
            reward = -100.0
        elif abs(self.state[0]) > self.max_reward_cart_pos:
            reward = -1.0
        else:
            reward = float(np.cos(self.state[2]))
        return self.state.astype(np.float32), reward, done, {}


class MountainCarEnv(_ClassicEnv):
    """Under-powered car on a hill; height-bonus shaped reward."""

    def __init__(self, config=None, seed: int = 0, height_bonus: float = 1.0,
                 goal_cart_pos: float = 0.6):
        super().__init__(config, seed)
        self.height_bonus = height_bonus
        self.goal_cart_pos = goal_cart_pos
        self.action_space = Box(np.array([-1.0]), np.array([1.0]))
        self.observation_space = Box(-np.full(2, np.inf), np.full(2, np.inf))
        self.state = np.zeros(2)  # x, xdot

    def reset(self) -> np.ndarray:
        self.state = np.array([-0.5, self.rng.uniform(-0.07, 0.07)])
        return self.state.astype(np.float32)

    def step(self, a):
        force = float(np.clip(np.asarray(a).reshape(-1)[0], -1.0, 1.0))
        x, xd = self.state
        xd = np.clip(xd + 0.0015 * force - 0.0025 * np.cos(3 * x), -0.07, 0.07)
        x = np.clip(x + xd, -1.2, 0.6)
        if x <= -1.2:
            xd = max(xd, 0.0)
        self.state = np.array([x, xd])
        height = np.sin(3 * x)  # hill profile; height bonus as in the reference
        done = x >= self.goal_cart_pos
        reward = -1.0 + self.height_bonus * float(height)
        return self.state.astype(np.float32), reward, done, {}


class DoublePendulumEnv(_ClassicEnv):
    """Two-link pendulum (torque on the base joint); reward = -|tip - target|."""

    link_len, m, g, dt, damping = 1.0, 1.0, 9.8, 0.02, 0.05

    def __init__(self, config=None, seed: int = 0):
        super().__init__(config, seed)
        self.action_space = Box(np.array([-3.0]), np.array([3.0]))
        self.observation_space = Box(-np.full(4, np.inf), np.full(4, np.inf))
        self.state = np.zeros(4)  # th1, th2, th1dot, th2dot

    def _obs(self) -> np.ndarray:
        # observations are upright-relative like the reference (reset near 0
        # = near the target, double_pendulum_env.py:34-41); internal angles
        # are measured from the DOWNWARD vertical for the standard dynamics
        th1, th2, w1, w2 = self.state
        wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
        return np.array([wrap(th1 - np.pi), wrap(th2 - np.pi), w1, w2], np.float32)

    def reset(self) -> np.ndarray:
        stds = np.array([0.1, 0.1, 0.01, 0.01])
        self.state = np.array([np.pi, np.pi, 0.0, 0.0]) + self.rng.normal(size=4) * stds
        return self._obs()

    def step(self, a):
        torque = float(np.clip(np.asarray(a).reshape(-1)[0], -3.0, 3.0))
        th1, th2, w1, w2 = self.state
        # equal-mass, equal-length double-pendulum dynamics (standard
        # Lagrangian form, angles from downward vertical), damped, torque at
        # the base joint
        d = th1 - th2
        m, l, g = self.m, self.link_len, self.g
        den = l * (2 * m - m * np.cos(2 * d))
        a1 = (
            -m * g * (2 * np.sin(th1) + np.sin(th1 - 2 * th2))
            - 2 * m * np.sin(d) * (w2**2 * l + w1**2 * l * np.cos(d))
            + 2 * torque / l
        ) / den
        a2 = (
            2
            * np.sin(d)
            * (w1**2 * l * 2 * m + g * 2 * m * np.cos(th1) + w2**2 * l * m * np.cos(d))
        ) / den
        w1 = w1 + self.dt * (a1 - self.damping * w1)
        w2 = w2 + self.dt * (a2 - self.damping * w2)
        self.state = np.array([th1 + self.dt * w1, th2 + self.dt * w2, w1, w2])
        # tip position; target = both links upright (double_pendulum_env.py:52-58)
        tip = np.array(
            [
                l * np.sin(self.state[0]) + l * np.sin(self.state[1]),
                -l * np.cos(self.state[0]) - l * np.cos(self.state[1]),
            ]
        )
        tgt = np.array([0.0, 2 * l])
        reward = -float(np.linalg.norm(tip - tgt))
        return self._obs(), reward, False, {}
