"""TPIL/GAIL baseline tests: gradient reversal, discriminator learning,
alternating trainer smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.baselines_tpil import (
    DomainConfusionVelocityDiscriminator,
    TpilTrainer,
    gradient_reversal,
)
from imitation_from_observation_tpu.baselines_tpil.trainer import velocity_pairs
from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.rl import GaussianMLPPolicy, LinearFeatureBaseline, TRPO
from imitation_from_observation_tpu.sim import NormalizedEnv, make_env


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 0.2) ** 2)

    x = jnp.asarray([1.0, -2.0])
    np.testing.assert_allclose(np.asarray(gradient_reversal(x, 0.2)), [1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [-0.4, 0.8], rtol=1e-6)  # -(0.2)*2x


def test_discriminator_learns_classes(rng):
    hw = 16
    disc = DomainConfusionVelocityDiscriminator((hw, hw, 3))
    # expert pairs: bright frames; novice: dark frames
    n = 64
    expert = rng.random((n, hw, hw, 3)).astype(np.float32) * 0.5 + 0.5
    novice = rng.random((n, hw, hw, 3)).astype(np.float32) * 0.5 - 1.0
    f1 = np.vstack([expert, novice])
    f2 = f1.copy()
    classes = np.vstack([np.tile([1, 0], (n, 1)), np.tile([0, 1], (n, 1))]).astype(np.float32)
    domains = classes.copy()
    for _ in range(30):
        loss, acc = disc.train([f1, f2], dict(classes=classes, domains=domains))
    assert acc > 0.9, acc
    p = disc.get_reward([expert, expert])
    assert p[:, 0].mean() > 0.6  # P(expert) high on expert frames


def test_velocity_pairs():
    frames = np.arange(6)[:, None].astype(np.float32)
    f1, f2 = velocity_pairs(frames, offset=3)
    np.testing.assert_array_equal(f2[:, 0], [3, 4, 5, 5, 5, 5])


def test_tpil_trainer_iteration(tmp_path):
    hw, horizon = 16, 6
    cfg = dict(image_size=(hw, hw), render_size=(64, 64), horizon=horizon)
    novice_env = NormalizedEnv(make_env("pusher3dof", EnvConfig(name="pusher3dof", seed=0, **cfg)))
    expert_env = NormalizedEnv(make_env("pusher3dof", EnvConfig(name="pusher3dof", seed=1, **cfg)))
    obs_dim = novice_env.observation_space.flat_dim
    novice = GaussianMLPPolicy(obs_dim, 3, hidden=(8,), init_std=1.0, seed=0)
    expert = GaussianMLPPolicy(obs_dim, 3, hidden=(8,), init_std=1.0, seed=1)
    fail = GaussianMLPPolicy(obs_dim, 3, hidden=(8,), init_std=1.0, seed=2)
    disc = DomainConfusionVelocityDiscriminator((hw, hw, 3))
    trainer = TpilTrainer(
        disc,
        novice,
        novice_env,
        expert_env,
        expert,
        expert_fail_policy=fail,
        policy_optimizer=TRPO(novice),
        baseline=LinearFeatureBaseline(),
        horizon=horizon,
        batch_size=16,
        disc_epochs=1,
    )
    row = trainer.take_iteration(n_trajs_cost=2, n_trajs_policy=3)
    assert "GanLoss" in row and np.isfinite(row["GanLoss"])
    assert "ReturnTrue" in row
    assert trainer.iteration == 1
    novice_env.close(); expert_env.close()


def test_gail_variant_smoke(tmp_path):
    """GAIL = no expert-fail group, no domain-confusion loss."""
    hw, horizon = 16, 4
    cfg = dict(image_size=(hw, hw), render_size=(64, 64), horizon=horizon)
    novice_env = NormalizedEnv(make_env("pusher3dof", EnvConfig(name="pusher3dof", seed=0, **cfg)))
    expert_env = NormalizedEnv(make_env("pusher3dof", EnvConfig(name="pusher3dof", seed=1, **cfg)))
    obs_dim = novice_env.observation_space.flat_dim
    novice = GaussianMLPPolicy(obs_dim, 3, hidden=(8,), init_std=1.0, seed=0)
    expert = GaussianMLPPolicy(obs_dim, 3, hidden=(8,), init_std=1.0, seed=1)
    disc = DomainConfusionVelocityDiscriminator((hw, hw, 3), dom_loss_weight=0.0)
    trainer = TpilTrainer(
        disc,
        novice,
        novice_env,
        expert_env,
        expert,
        policy_optimizer=TRPO(novice),
        baseline=LinearFeatureBaseline(),
        horizon=horizon,
        batch_size=16,
        disc_epochs=1,
        use_expert_fail=False,
    )
    row = trainer.take_iteration(n_trajs_cost=2, n_trajs_policy=2)
    assert np.isfinite(row["GanLoss"])
    # the no-expert-fail reward path: rewards are relabeled with
    # P(expert | pair) from a 2-group discriminator — a per-path sum of
    # per-frame probabilities, so GanReward must land in [0, n_frames]
    assert np.isfinite(row["GanReward"])
    assert 0.0 <= row["GanReward"] <= horizon
    assert not trainer.use_expert_fail
    novice_env.close(); expert_env.close()


def test_collect_paths_stops_at_per_env_done():
    """The vec fast path must not splice an auto-reset episode's tail onto a
    finished trajectory: an env done at t gets a t-step path while the rest
    run to the horizon (the per-episode _rollout contract)."""
    from imitation_from_observation_tpu.baselines_tpil.trainer import (
        RandomPolicy,
        TpilTrainer,
    )

    class FakeVec:
        n_envs = 2

        def __init__(self):
            self.t = 0

        def reset(self):
            self.t = 0
            return np.zeros((2, 3), np.float32)

        def step(self, actions):
            self.t += 1
            obs = np.full((2, 3), self.t, np.float32)
            dones = np.array([self.t >= 2, False])  # env 0 ends early
            infos = [{"frames": None} for _ in range(2)]
            return obs, np.zeros(2), dones, infos

        def close(self):
            pass

    trainer = TpilTrainer.__new__(TpilTrainer)  # only _collect_paths deps
    trainer.horizon = 5
    trainer.rng = __import__(
        "imitation_from_observation_tpu.core.rng", fromlist=["RngStream"]
    ).RngStream(0)
    paths = trainer._collect_paths(RandomPolicy(3), FakeVec(), 2)
    lengths = sorted(len(p["rewards"]) for p in paths)
    assert lengths == [2, 5], lengths


def test_mlp_discriminator_learns(rng=None):
    """MLPDiscriminator (discriminator.py:93-119): 3-layer relu MLP separates
    two Gaussian blobs; loss falls, probs favor the right class."""
    from imitation_from_observation_tpu.baselines_tpil import MLPDiscriminator

    rng = np.random.default_rng(0)
    d = MLPDiscriminator(input_dim=6)
    xa = rng.normal(1.5, 0.3, (64, 6)).astype(np.float32)
    xb = rng.normal(-1.5, 0.3, (64, 6)).astype(np.float32)
    x = np.concatenate([xa, xb])
    t = np.zeros((128, 2), np.float32)
    t[:64, 0] = 1.0
    t[64:, 1] = 1.0
    first = d.train(x, t)
    for _ in range(60):
        last = d.train(x, t)
    assert last < first
    probs = d(x)
    assert probs.shape == (128, 2)
    assert (np.argmax(probs, 1) == np.argmax(t, 1)).mean() > 0.9
    logits = d(x, softmax=False)
    np.testing.assert_allclose(
        probs, np.exp(logits) / np.exp(logits).sum(1, keepdims=True), rtol=1e-4, atol=1e-5
    )


def test_conv_discriminator_learns():
    """ConvDiscriminator (discriminator.py:123-199): one conv + pool + time
    concat + 2-layer head separates bright from dark images."""
    from imitation_from_observation_tpu.baselines_tpil import ConvDiscriminator

    rng = np.random.default_rng(1)
    d = ConvDiscriminator(input_dim=(8, 8, 3), time_dim=1)
    imgs = np.concatenate(
        [rng.uniform(0.5, 1.0, (32, 8, 8, 3)), rng.uniform(-1.0, -0.5, (32, 8, 8, 3))]
    ).astype(np.float32)
    tfeat = np.zeros((64, 1), np.float32)
    t = np.zeros((64, 2), np.float32)
    t[:32, 0] = 1.0
    t[32:, 1] = 1.0
    first = d.train((imgs, tfeat), t)
    for _ in range(60):
        last = d.train((imgs, tfeat), t)
    assert last < first
    probs = d((imgs, tfeat))
    assert (np.argmax(probs, 1) == np.argmax(t, 1)).mean() > 0.9
