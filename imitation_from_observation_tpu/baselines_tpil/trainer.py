"""TPIL/GAIL alternating trainer.

Capability match for the reference ``CyberPunkTrainer``
(sandbox/bradly/third_person/algos/cyberpunk_trainer.py:90-241):

per iteration:
1. collect image trajectories from three sources — expert-success (class
   expert, domain expert), novice (class novice, domain novice), expert-fail
   (class novice, domain expert) — expert-fail being what forces the
   discriminator to judge *behavior*, not appearance
2. shuffle all (frame_t, frame_{t+3}) pairs with one-hot class/domain labels
   (:161-183; the +3 offset clamps at the trajectory end)
3. train the discriminator ``disc_epochs`` epochs (:140-159)
4. collect novice trajectories whose rewards are relabeled with
   P(expert | pair) (:231-241)
5. one policy-optimization step (GAE + TRPO) on the relabeled paths

GAIL variant (cyberpunk_trainer_gail.py): pass ``use_expert_fail=False`` and
build the discriminator with ``dom_loss_weight=0``.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from imitation_from_observation_tpu.core.log import Logger, get_logger
from imitation_from_observation_tpu.core.rng import RngStream
from imitation_from_observation_tpu.rl.gae import process_paths


def _frames_from_path(path: dict[str, Any]) -> np.ndarray:
    frames = [f[0] for f in path["env_infos"]["frames"] if f is not None]
    return np.stack(frames).astype(np.float32)


def velocity_pairs(frames: np.ndarray, offset: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(frame_t, frame_{min(t+offset, T-1)}) pairs (cyberpunk_trainer.py:172-178)."""
    idx = np.minimum(np.arange(len(frames)) + offset, len(frames) - 1)
    return frames, frames[idx]


class RandomPolicy:
    """Uniform-random policy (the reference's expert-fail default,
    sandbox/bradly/third_person/policy/random_policy.py)."""

    recurrent = False

    def __init__(self, action_dim: int, low: float = -1.0, high: float = 1.0, seed: int = 0):
        self.action_dim = action_dim
        self.low, self.high = low, high
        self.rng = np.random.default_rng(seed)

    def get_action(self, obs, key=None):
        a = self.rng.uniform(self.low, self.high, self.action_dim)
        return a, {}

    def get_actions(self, obs, key=None):
        a = self.rng.uniform(self.low, self.high, (len(obs), self.action_dim))
        return a, {}


class TpilTrainer:
    def __init__(
        self,
        disc,
        novice_policy,
        novice_env,
        expert_env,
        expert_policy,
        expert_fail_policy=None,
        policy_optimizer=None,  # TRPO/VPG over novice_policy
        baseline=None,
        horizon: int = 50,
        batch_size: int = 64,
        disc_epochs: int = 10,
        discount: float = 0.99,
        use_expert_fail: bool = True,
        seed: int = 0,
        logger: Logger | None = None,
    ):
        self.disc = disc
        self.novice_policy = novice_policy
        self.novice_env = novice_env
        self.expert_env = expert_env
        self.expert_policy = expert_policy
        self.expert_fail_policy = expert_fail_policy
        self.policy_optimizer = policy_optimizer
        self.baseline = baseline
        self.horizon = horizon
        self.batch_size = batch_size
        self.disc_epochs = disc_epochs
        self.discount = discount
        self.use_expert_fail = use_expert_fail and expert_fail_policy is not None
        self.rng = RngStream(seed)
        self.nprng = np.random.default_rng(seed)
        self.log = logger or get_logger()
        self.iteration = 0
        self.true_rew_means: list[float] = []
        self.gan_rew_means: list[float] = []
        # one-hot bases (cyberpunk_trainer.py:60-63)
        self.expert_basis = np.array([1.0, 0.0])
        self.novice_basis = np.array([0.0, 1.0])

    # -- rollout collection -------------------------------------------------
    def _rollout(self, policy, env) -> dict[str, Any]:
        from imitation_from_observation_tpu.rl.sampler import rollout

        return rollout(env, policy, self.horizon, self.rng)

    def _collect_paths(self, policy, env, n_trajs) -> list[dict[str, Any]]:
        """n_trajs full episodes; batched over a vec env (anything with
        ``n_envs``: NativeVecTask / VecEnv) or one-at-a-time otherwise. The
        vec path makes the reference's 50x500 scale affordable on one core
        (the reference spread rollouts over worker processes,
        cyberpunk_aws.py:21-106 + parallel_sampler)."""
        if not hasattr(env, "n_envs"):
            return [self._rollout(policy, env) for _ in range(n_trajs)]
        from imitation_from_observation_tpu.rl.sampler import VectorizedSampler

        paths: list[dict[str, Any]] = []
        while len(paths) < n_trajs:
            obs = env.reset()
            running = [
                dict(observations=[], actions=[], rewards=[], env_infos=[], agent_infos=[])
                for _ in range(env.n_envs)
            ]
            done_mask = np.zeros(env.n_envs, bool)
            for _ in range(self.horizon):
                actions, agent_infos = policy.get_actions(obs, self.rng.next())
                next_obs, rewards, dones, env_infos = env.step(actions)
                for i in range(env.n_envs):
                    if done_mask[i]:
                        # episode i already ended — vec envs auto-reset, so
                        # appending further steps would splice two episodes
                        # (and two contexts) into one discriminator trajectory
                        continue
                    running[i]["observations"].append(obs[i])
                    running[i]["actions"].append(actions[i])
                    running[i]["rewards"].append(rewards[i])
                    running[i]["env_infos"].append(env_infos[i])
                    running[i]["agent_infos"].append(
                        {k: v[i] for k, v in agent_infos.items()} if agent_infos else {}
                    )
                done_mask |= np.asarray(dones, bool)
                obs = next_obs
                if done_mask.all():
                    break
            for r in running:
                if not r["agent_infos"][0]:
                    for step in r["agent_infos"]:
                        step.update(dummy=np.zeros(1))
                paths.append(VectorizedSampler._finalize(r))
        return paths[:n_trajs]

    def collect_trajs_for_cost(self, n_trajs, policy, env, dom, cls):
        data, classes, domains = [], [], []
        for path in self._collect_paths(policy, env, n_trajs):
            frames = _frames_from_path(path)
            t = len(frames)
            data.append(frames)
            classes.append(np.tile(cls, (t, 1)))
            domains.append(np.tile(dom, (t, 1)))
        t_min = min(len(d) for d in data)
        return dict(
            data=np.stack([d[:t_min] for d in data]),
            classes=np.stack([c[:t_min] for c in classes]),
            domains=np.stack([d_[:t_min] for d_ in domains]),
        )

    def shuffle_to_training_data(self, *groups):
        data = np.vstack([g["data"] for g in groups])
        classes = np.vstack([g["classes"] for g in groups])
        domains = np.vstack([g["domains"] for g in groups])
        n_traj, t_steps = data.shape[:2]
        total = n_traj * t_steps
        order = self.nprng.permutation(total)
        traj = order // t_steps
        time = order % t_steps
        time_p3 = np.minimum(time + 3, t_steps - 1)
        return (
            data[traj, time],
            data[traj, time_p3],
            domains[traj, time],
            classes[traj, time],
        )

    def train_cost(self, d1, d2, classes, domains, n_epochs) -> float:
        last = 0.0
        for ep in range(n_epochs):
            losses, accs = [], []
            for i in range(0, len(d1), self.batch_size):
                sl = slice(i, i + self.batch_size)
                loss, acc = self.disc.train(
                    [d1[sl], d2[sl]], dict(classes=classes[sl], domains=domains[sl])
                )
                losses.append(loss)
                accs.append(acc)
            last = float(np.mean(losses))
            self.log.record_tabular(f"GanLoss{ep}", last)
            self.log.record_tabular(f"GanAcc{ep}", float(np.mean(accs)))
        return last

    def collect_trajs_for_policy(self, n_trajs):
        paths = []
        for path in self._collect_paths(self.novice_policy, self.novice_env, n_trajs):
            frames = _frames_from_path(path)
            f1, f2 = velocity_pairs(frames)
            p_expert = self.disc.get_reward([f1, f2], softmax=True)[:, 0]
            path["true_rewards"] = path["rewards"].copy()
            # rendered frame j belongs to env step 2j+1 — spread P(expert)
            # onto those steps (the reference's envs render every step in
            # tpil mode; ours render odd steps, so the label lands there)
            rewards = np.zeros_like(path["rewards"])
            for j, r in enumerate(p_expert):
                rewards[min(2 * j + 1, len(rewards) - 1)] = r
            path["rewards"] = rewards
            paths.append(path)
        return paths

    # -- one alternating iteration (cyberpunk_trainer.py:98-132) ------------
    def take_iteration(self, n_trajs_cost: int, n_trajs_policy: int) -> dict[str, float]:
        expert_data = self.collect_trajs_for_cost(
            n_trajs_cost, self.expert_policy, self.expert_env, self.expert_basis, self.expert_basis
        )
        novice_data = self.collect_trajs_for_cost(
            n_trajs_cost, self.novice_policy, self.novice_env, self.novice_basis, self.novice_basis
        )
        groups = [expert_data, novice_data]
        if self.use_expert_fail:
            groups.append(
                self.collect_trajs_for_cost(
                    n_trajs_cost, self.expert_fail_policy, self.expert_env,
                    self.expert_basis, self.novice_basis,
                )
            )
        d1, d2, doms, classes = self.shuffle_to_training_data(*groups)
        gan_loss = self.train_cost(d1, d2, classes, doms, self.disc_epochs)

        policy_paths = self.collect_trajs_for_policy(n_trajs_policy)
        gan_rew = float(np.mean([p["rewards"].sum() for p in policy_paths]))
        true_rew = float(np.mean([np.sum(p["env_infos"]["reward_true"]) for p in policy_paths]))
        self.gan_rew_means.append(gan_rew)
        self.true_rew_means.append(true_rew)
        samples = process_paths(policy_paths, self.baseline, discount=self.discount)
        opt_diag = self.policy_optimizer.optimize(samples)
        self.iteration += 1
        self.log.record_tabular("ReturnTrue", true_rew)
        self.log.record_tabular("GanReward", gan_rew)
        row = dict(GanLoss=gan_loss, GanReward=gan_rew, ReturnTrue=true_rew)
        row.update(opt_diag)
        return row
