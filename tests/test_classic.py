"""Classic-control env family (replaces the reference's Box2D test envs)."""

import numpy as np
import pytest

from imitation_from_observation_tpu.sim import make_env
from imitation_from_observation_tpu.sim.classic import (
    CartpoleEnv,
    CartpoleSwingupEnv,
    DoublePendulumEnv,
    MountainCarEnv,
)

ALL = ["cartpole", "cartpole_swingup", "mountain_car", "double_pendulum"]


@pytest.mark.parametrize("name", ALL)
def test_smoke_and_determinism(name, rng):
    env = make_env(name)
    env.seed(3)
    obs = env.reset()
    assert obs.shape == (env.observation_space.flat_dim,)
    traj = []
    for _ in range(20):
        a = env.action_space.sample(rng)
        obs, r, done, _ = env.step(a)
        assert np.all(np.isfinite(obs)) and np.isfinite(r)
        traj.append((obs.copy(), r))
        if done:
            break
    # same seed + same actions -> identical trajectory
    env2 = make_env(name)
    env2.seed(3)
    env2.reset()
    rng2 = np.random.default_rng(0)
    for obs_ref, r_ref in traj:
        a = env2.action_space.sample(rng2)
        obs2, r2, done2, _ = env2.step(a)
        np.testing.assert_allclose(obs2, obs_ref, atol=1e-6)
        assert r2 == pytest.approx(r_ref)
        if done2:
            break


def test_cartpole_balance_semantics():
    env = CartpoleEnv(seed=0)
    env.reset()
    # zero force from a near-upright start: high reward while alive
    _, r, done, _ = env.step(np.zeros(1))
    assert not done and r > 9.5
    # force the pole over the angle limit -> done with zero reward
    env.state = np.array([0.0, 0.0, 0.25, 0.0])
    _, r, done, _ = env.step(np.zeros(1))
    assert done and r == 0.0


def test_swingup_starts_hanging():
    env = CartpoleSwingupEnv(seed=1)
    obs = env.reset()
    assert abs(obs[2]) > np.pi - 1.01  # angle near pi (hanging)
    _, r, done, _ = env.step(np.zeros(1))
    assert not done and r < 0.7  # cos(angle near pi) is negative-ish


def test_mountain_car_needs_momentum():
    env = MountainCarEnv(seed=0)
    env.reset()
    # full throttle uphill from the valley cannot reach the goal directly
    for _ in range(60):
        _, r, done, _ = env.step(np.ones(1))
        assert r <= 0.0
        if done:
            break
    assert not done


def test_double_pendulum_gravity_pulls_from_upright():
    env = DoublePendulumEnv(seed=0)
    env.reset()
    r0 = env.step(np.zeros(1))[1]
    for _ in range(150):
        _, r, _, _ = env.step(np.zeros(1))
    # upright is unstable: with no torque the tip falls away from the target
    assert r < r0 - 0.5


def test_trpo_learns_cartpole():
    from imitation_from_observation_tpu.core.config import RLConfig
    from imitation_from_observation_tpu.rl import (
        BatchPolopt,
        GaussianMLPPolicy,
        LinearFeatureBaseline,
        TRPO,
    )
    from imitation_from_observation_tpu.sim import VecEnv

    vec = VecEnv([lambda i=i: _seeded("cartpole", i) for i in range(8)], max_path_length=100)
    policy = GaussianMLPPolicy(4, 1, hidden=(16, 16), init_std=1.0, seed=0)
    cfg = RLConfig(batch_size=1600, max_path_length=100, n_iters=6, n_envs=8,
                   snapshot_mode="none")
    algo = BatchPolopt(vec, policy, LinearFeatureBaseline(), TRPO(policy), cfg)
    hist = algo.train()
    vec.close()
    first, last = hist[0]["AverageReturn"], hist[-1]["AverageReturn"]
    assert last > first + 50, (first, last)


def _seeded(name, i):
    env = make_env(name)
    env.seed(100 + i)
    return env
