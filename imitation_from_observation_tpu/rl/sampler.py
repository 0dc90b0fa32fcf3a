"""Rollout collection.

``VectorizedSampler`` mirrors the reference's single-process batched sampler
(sandbox/rocky/tf/samplers/vectorized_sampler.py:20-107): N env copies
stepped in lockstep, one batched jitted policy call per step, trajectories
cut at ``max_path_length``, collection until ``batch_size`` steps. Phase
timings (PolicyExecTime/EnvExecTime) are kept as diagnostics like the
reference's (:47-105).

``rollout`` is the single-env loop (rllab/sampler/utils.py:6-42).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from imitation_from_observation_tpu.core.rng import RngStream


def _stack_info_list(infos: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack per-step info dicts; frames may be None on even steps, so that
    key stays a list (the reward engine filters the Nones, like the
    reference's `if img is not None`, base.py:193)."""
    out: dict[str, Any] = {}
    for k in infos[0]:
        vals = [inf.get(k) for inf in infos]
        if any(v is None for v in vals) or (vals and isinstance(vals[0], np.ndarray) and vals[0].dtype == np.uint8):
            out[k] = vals
        else:
            out[k] = np.asarray(vals)
    return out


def rollout(env, policy, max_path_length: int, rng: RngStream) -> dict[str, Any]:
    obs_list, action_list, reward_list = [], [], []
    env_infos, agent_infos = [], []
    obs = env.reset()
    for _ in range(max_path_length):
        action, agent_info = policy.get_action(np.asarray(obs), rng.next())
        next_obs, reward, done, env_info = env.step(action)
        obs_list.append(obs)
        action_list.append(action)
        reward_list.append(reward)
        env_infos.append(env_info)
        agent_infos.append(agent_info)
        obs = next_obs
        if done:
            break
    return dict(
        observations=np.asarray(obs_list),
        actions=np.asarray(action_list),
        rewards=np.asarray(reward_list, np.float64),
        env_infos=_stack_info_list(env_infos),
        agent_infos={k: np.asarray([i[k] for i in agent_infos]) for k in agent_infos[0]},
    )


class VectorizedSampler:
    def __init__(self, vec_env, policy, batch_size: int, max_path_length: int, seed: int = 0):
        self.vec_env = vec_env
        self.policy = policy
        self.batch_size = batch_size
        self.max_path_length = max_path_length
        self.rng = RngStream(seed)
        # trajectory cutting is delegated to the vec env (VecEnvExecutor's
        # auto-reset at the limit, vec_env_executor.py:30-40): if its limit is
        # absent or different, paths would silently run long (or, with a task
        # that never terminates, collection would spin forever) — fail loudly
        env_limit = getattr(vec_env, "max_path_length", None)
        if env_limit is not None and env_limit != max_path_length:
            raise ValueError(
                f"vec env max_path_length={env_limit} != sampler's "
                f"{max_path_length}; construct the vec env with the RL config's limit"
            )

    def obtain_samples(self) -> tuple[list[dict[str, Any]], dict[str, float]]:
        if hasattr(self.vec_env, "step_batch"):
            return self._obtain_lockstep()
        n = self.vec_env.n_envs
        running: list[dict[str, list]] = [
            dict(observations=[], actions=[], rewards=[], env_infos=[], agent_infos=[])
            for _ in range(n)
        ]
        paths: list[dict[str, Any]] = []
        n_steps = 0
        policy_time = env_time = 0.0
        obs = self.vec_env.reset()
        # stamp the scene-context fingerprint so the reward engine can enforce
        # its one-pinned-context warmup contract (engine._check_shared_context)
        ctx_fp = getattr(self.vec_env, "context_fingerprint", lambda: None)()
        while n_steps < self.batch_size:
            t0 = time.perf_counter()
            actions, agent_infos = self.policy.get_actions(obs, self.rng.next())
            t1 = time.perf_counter()
            next_obs, rewards, dones, env_infos = self.vec_env.step(actions)
            t2 = time.perf_counter()
            policy_time += t1 - t0
            env_time += t2 - t1
            # device-resident frames: a lockstep episode end hands over ONE
            # [T,N,V,...] device block shared by this episode's N paths (the
            # reward engine indexes/scoress it without a host round trip)
            block = None
            if dones[0] and np.all(dones) and hasattr(self.vec_env, "pop_episode_frames"):
                block = self.vec_env.pop_episode_frames()
            for i in range(n):
                running[i]["observations"].append(obs[i])
                running[i]["actions"].append(actions[i])
                running[i]["rewards"].append(rewards[i])
                running[i]["env_infos"].append(env_infos[i])
                running[i]["agent_infos"].append(
                    {k: v[i] for k, v in agent_infos.items()}
                )
                if dones[i]:
                    path = self._finalize(running[i])
                    if block is not None:
                        path["frames_dev"] = (block, i)
                    if ctx_fp is not None:
                        path["context_fp"] = ctx_fp
                    paths.append(path)
                    n_steps += len(running[i]["rewards"])
                    running[i] = dict(
                        observations=[], actions=[], rewards=[], env_infos=[], agent_infos=[]
                    )
                elif len(running[i]["rewards"]) > self.max_path_length:
                    raise RuntimeError(
                        f"env {i} exceeded max_path_length={self.max_path_length} "
                        "without done — the vec env is not enforcing its limit"
                    )
            if np.any(dones) and hasattr(self.policy, "reset_where"):
                self.policy.reset_where(dones)  # recurrent state of restarted envs
            obs = next_obs
        return paths, dict(PolicyExecTime=policy_time, EnvExecTime=env_time)

    def _obtain_lockstep(self) -> tuple[list[dict[str, Any]], dict[str, float]]:
        """Fast path for lockstep vec envs (``step_batch``): accumulate
        step-level BATCH arrays and slice per-env paths only at episode end,
        instead of fanning 250 info dicts + per-env list appends out on every
        vec-step (the python overhead the reference paid in its per-worker
        rollout loops, rllab/sampler/parallel_sampler.py:99-127). Produces
        bit-identical paths to the generic loop (tested)."""
        vec, n = self.vec_env, self.vec_env.n_envs
        paths: list[dict[str, Any]] = []
        n_steps = 0
        policy_time = env_time = 0.0
        obs = vec.reset()
        ctx_fp = getattr(vec, "context_fingerprint", lambda: None)()
        obs_s: list = []
        act_s: list = []
        rew_s: list = []
        rt_s: list = []
        frm_s: list = []
        ag_s: list = []
        while n_steps < self.batch_size:
            t0 = time.perf_counter()
            actions, agent_infos = self.policy.get_actions(obs, self.rng.next())
            t1 = time.perf_counter()
            next_obs, rewards, done, info = vec.step_batch(actions)
            t2 = time.perf_counter()
            policy_time += t1 - t0
            env_time += t2 - t1
            obs_s.append(obs)
            act_s.append(actions)
            rew_s.append(rewards)
            rt_s.append(info["reward_true"])
            frm_s.append(info["frames"])
            ag_s.append(agent_infos)
            obs = next_obs
            if not done and len(rew_s) > self.max_path_length:
                raise RuntimeError(
                    f"lockstep episode exceeded max_path_length={self.max_path_length} "
                    "without done — the vec env is not enforcing its limit"
                )
            if done:
                block = (
                    vec.pop_episode_frames()
                    if hasattr(vec, "pop_episode_frames")
                    else None
                )
                O = np.stack(obs_s)
                A = np.stack(act_s)
                R = np.stack(rew_s)
                RT = np.stack(rt_s)
                AG = {k: np.stack([a[k] for a in ag_s]) for k in ag_s[0]}
                T = len(rew_s)
                for i in range(n):
                    path = dict(
                        observations=O[:, i],
                        actions=A[:, i],
                        rewards=np.asarray(R[:, i], np.float64),
                        env_infos=dict(
                            reward_true=RT[:, i],
                            frames=[None if f is None else f[i] for f in frm_s],
                        ),
                        agent_infos={k: v[:, i] for k, v in AG.items()},
                    )
                    if block is not None:
                        path["frames_dev"] = (block, i)
                    if ctx_fp is not None:
                        path["context_fp"] = ctx_fp
                    paths.append(path)
                    n_steps += T
                obs_s, act_s, rew_s, rt_s, frm_s, ag_s = [], [], [], [], [], []
                if hasattr(self.policy, "reset_where"):
                    self.policy.reset_where(np.ones(n, bool))
        return paths, dict(PolicyExecTime=policy_time, EnvExecTime=env_time)

    @staticmethod
    def _finalize(traj: dict[str, list]) -> dict[str, Any]:
        return dict(
            observations=np.asarray(traj["observations"]),
            actions=np.asarray(traj["actions"]),
            rewards=np.asarray(traj["rewards"], np.float64),
            env_infos=_stack_info_list(traj["env_infos"]),
            agent_infos={
                k: np.asarray([i[k] for i in traj["agent_infos"]])
                for k in traj["agent_infos"][0]
            },
        )


def truncate_paths(paths: list[dict[str, Any]], n_samples: int) -> list[dict[str, Any]]:
    """Keep whole paths up to n_samples, truncating the last one (reference
    parallel_sampler.truncate_paths, :130-156)."""
    out: list[dict[str, Any]] = []
    total = 0
    for p in paths:
        plen = len(p["rewards"])
        if total + plen <= n_samples:
            out.append(p)
            total += plen
        else:
            keep = n_samples - total
            if keep > 0:
                trunc = {
                    k: (
                        {kk: vv[:keep] for kk, vv in v.items()}
                        if isinstance(v, dict)
                        else (v if k in ("frames_dev", "context_fp") else v[:keep])
                    )
                    for k, v in p.items()
                }
                out.append(trunc)
            break
    return out
