"""End-to-end pipeline tests: the reference's main loop shapes
(run_trpo_*.py -> TRPO.train with reward modes) at toy scale."""

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    RewardConfig,
    RLConfig,
    TranslationModelConfig,
)
from imitation_from_observation_tpu.models import build_model
from imitation_from_observation_tpu.reward import VisualRewardEngine
from imitation_from_observation_tpu.rl import (
    BatchPolopt,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
    TRPO,
)
from imitation_from_observation_tpu.sim import NormalizedEnv, VecEnv, make_env


def _vec(name, n, horizon, **env_kw):
    def mk(i):
        return lambda: NormalizedEnv(
            make_env(name, EnvConfig(name=name, horizon=horizon, seed=i, **env_kw))
        )

    return VecEnv([mk(i) for i in range(n)], max_path_length=horizon)


def test_oracle_trpo_pusher_smoke(tmp_path):
    """2 TRPO iterations on pusher with the oracle reward: the full loop
    (sample -> oracle splice -> GAE -> TRPO) runs, logs ReturnTrue, no NaNs."""
    horizon = 10
    vec = _vec("pusher3dof", 4, horizon, render_frames=False)
    policy = GaussianMLPPolicy(obs_dim=vec.observation_space.flat_dim, action_dim=3, init_std=1.0)
    algo = BatchPolopt(
        vec,
        policy,
        LinearFeatureBaseline(),
        TRPO(policy),
        RLConfig(batch_size=80, max_path_length=horizon, n_iters=2, snapshot_mode="last"),
        reward_engine=VisualRewardEngine(RewardConfig(mode="oracle")),
        log_dir=str(tmp_path),
    )
    history = algo.train()
    assert len(history) == 2
    assert "ReturnTrue" in history[0]
    assert np.isfinite(history[-1]["AverageReturn"])
    flat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(policy.params)])
    assert np.all(np.isfinite(flat))
    # snapshot written
    assert (tmp_path / "snapshots" / "params.npz").exists()
    vec.close()


def test_ours_mode_trpo_smoke(tmp_path):
    """1 iteration of the paper's actual loop: rendered frames -> translation
    model reward -> TRPO. Covers the render->device uint8 path."""
    horizon = 6
    hw = 16
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(hw, hw), base_filters=8, feat_size=32
    )
    model = build_model(model_cfg)
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    demo = np.random.default_rng(0).uniform(-1, 1, (horizon // 2, 5, hw, hw, 3)).astype(np.float32)
    engine = VisualRewardEngine(
        RewardConfig(mode="ours", scale=0.1), model_cfg, params=params, demo_data=demo
    )
    vec = _vec("pusher3dof", 2, horizon, image_size=(hw, hw), render_size=(64, 64))
    policy = GaussianMLPPolicy(obs_dim=vec.observation_space.flat_dim, action_dim=3, init_std=1.0)
    algo = BatchPolopt(
        vec,
        policy,
        LinearFeatureBaseline(),
        TRPO(policy),
        RLConfig(batch_size=12, max_path_length=horizon, n_iters=1, snapshot_mode="none"),
        reward_engine=engine,
        log_dir=str(tmp_path),
    )
    history = algo.train()
    # visual costs were spliced: returns are strictly negative
    assert history[0]["AverageReturn"] < 0
    assert engine.means is not None  # warmup ran
    vec.close()


def test_rl_video_recording(tmp_path):
    """record_video_every writes mp4 eval rollouts during RL (the gym
    monitor's video schedule capability)."""
    horizon = 4
    vec = _vec("pusher3dof", 2, horizon, render_frames=False, render_size=(64, 64))
    policy = GaussianMLPPolicy(obs_dim=vec.observation_space.flat_dim, action_dim=3, init_std=1.0)
    algo = BatchPolopt(
        vec, policy, LinearFeatureBaseline(), TRPO(policy),
        RLConfig(batch_size=8, max_path_length=horizon, n_iters=2, snapshot_mode="none"),
        reward_engine=VisualRewardEngine(RewardConfig(mode="oracle")),
        log_dir=str(tmp_path), record_video_every=2,
    )
    algo.train()
    import os
    vids = os.listdir(tmp_path / "videos")
    assert "itr_00000.mp4" in vids
    vec.close()


def test_inceptionsame_expert_stats(tmp_path):
    """inceptionsame: expert activation stats computed from rollouts
    (base.py:93-111) feed the z-scored reward."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.reward.backbones import compute_expert_feature_stats

    hw, horizon = 16, 6

    def feature_fn(frames_u8):
        x = np.asarray(frames_u8, np.float32) / 255.0
        return x.mean(axis=(1, 2))  # [T, 3] tiny "features"

    env = NormalizedEnv(make_env("pusher3dof", EnvConfig(
        name="pusher3dof", horizon=horizon, image_size=(hw, hw), render_size=(64, 64), seed=0)))
    expert = GaussianMLPPolicy(obs_dim=env.observation_space.flat_dim, action_dim=3, init_std=1.0)
    means, std = compute_expert_feature_stats(env, expert, feature_fn, n_rollouts=2, max_path_length=horizon)
    assert means.shape == (horizon // 2, 3)
    engine = VisualRewardEngine(RewardConfig(mode="inceptionsame"), feature_fn=feature_fn)
    engine.set_expert_stats(means, std)
    from imitation_from_observation_tpu.rl.sampler import rollout
    from imitation_from_observation_tpu.core.rng import RngStream

    path = rollout(env, expert, horizon, RngStream(1))
    engine.process([path])
    assert np.any(path["rewards"] != 0)
    env.close()
