"""Train an oracle expert policy with TRPO on the task's shaped reward.

The reference ships its experts as pickles (expert_push.pkl etc. at repo
root) trained with TRPO on ground-truth reward; this reproduces that
capability so demo generation (gen_videos) is self-contained.
"""

from __future__ import annotations

import os

from imitation_from_observation_tpu.core.checkpoint import save_pytree
from imitation_from_observation_tpu.core.config import EnvConfig, RLConfig
from imitation_from_observation_tpu.rl import (
    BatchPolopt,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
    TRPO,
)
from imitation_from_observation_tpu.sim import NormalizedEnv, VecEnv, make_env


def train_expert(
    task: str,
    out_path: str,
    rl: RLConfig | None = None,
    env_overrides: dict | None = None,
    log_dir: str | None = None,
) -> GaussianMLPPolicy:
    rl = rl or RLConfig(batch_size=5000, n_iters=80, init_std=1.0, n_envs=25, snapshot_mode="none")
    env_kw = dict(dense_reward=True, render_frames=False)
    env_kw.update(env_overrides or {})

    def mk(i):
        return lambda: NormalizedEnv(
            make_env(task, EnvConfig(name=task, seed=rl.seed + i, **env_kw))
        )

    vec = VecEnv([mk(i) for i in range(rl.n_envs)], max_path_length=rl.max_path_length)
    obs_dim = vec.observation_space.flat_dim
    act_dim = vec.action_space.flat_dim
    policy = GaussianMLPPolicy(
        obs_dim, act_dim, hidden=rl.policy_hidden, init_std=rl.init_std, seed=rl.seed
    )
    algo = BatchPolopt(
        vec,
        policy,
        LinearFeatureBaseline(),
        TRPO(policy, step_size=rl.step_size, cg_iters=rl.cg_iters),
        rl,
        log_dir=log_dir,
    )
    algo.train()
    vec.close()
    if algo.best is not None:
        # save the argmax-ReturnTrue iterate, not the final params: TRPO
        # experts can diverge late (observed: thrower best -3.03 @ itr 16,
        # final -6.36 — demos recorded from the final policy were WORSE than
        # the reference's weak expert)
        from imitation_from_observation_tpu.core.checkpoint import load_pytree

        policy.params = load_pytree(algo.best["path"], policy.params)
    save_pytree(
        out_path,
        policy.params,
        meta=dict(task=task, obs_dim=obs_dim, act_dim=act_dim, hidden=list(rl.policy_hidden)),
    )
    return policy


def load_expert(path: str) -> GaussianMLPPolicy:
    from imitation_from_observation_tpu.core.checkpoint import checkpoint_meta, load_pytree

    meta = checkpoint_meta(path)["meta"]
    policy = GaussianMLPPolicy(
        meta["obs_dim"], meta["act_dim"], hidden=tuple(meta["hidden"]), init_std=1.0
    )
    policy.params = load_pytree(path, policy.params)
    return policy
