"""Multiprocess vectorized environments.

Capability match for the reference's process-parallel rollout runtime —
``StatefulPool``/``parallel_sampler`` (N worker processes each owning private
env copies, results over pipes; rllab/sampler/stateful_pool.py:56-157,
parallel_sampler.py:99-127) and ``ParallelVecEnvExecutor``. Here workers are
spawned with an env *constructor spec* (name + EnvConfig), not a pickled live
env, and step in lockstep over pipes. Policy inference stays in the parent
(one batched jitted call), so workers never touch the accelerator — the
design constraint the reference solved with CUDA_VISIBLE_DEVICES pinning.
"""

from __future__ import annotations

import multiprocessing as mp
import numpy as np

from imitation_from_observation_tpu.core.config import EnvConfig


def _worker(remote, parent_remote, env_specs: list[tuple[str, EnvConfig]]):
    parent_remote.close()
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    envs = [NormalizedEnv(make_env(name, cfg)) for name, cfg in env_specs]
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                out = []
                for env, a in zip(envs, data):
                    o, r, d, info = env.step(a)
                    out.append((o, r, d, info))
                remote.send(out)
            elif cmd == "reset":
                remote.send([env.reset() for env in envs])
            elif cmd == "reset_some":
                remote.send({j: envs[j].reset() for j in data})
            elif cmd == "seed":
                for i, env in enumerate(envs):
                    env.seed(data + i)
                remote.send(None)
            elif cmd == "spaces":
                remote.send((envs[0].observation_space, envs[0].action_space))
            elif cmd == "close":
                for env in envs:
                    env.close()
                remote.send(None)
                break
    except (KeyboardInterrupt, EOFError):
        pass


class SubprocVecEnv:
    """N envs spread over ``n_workers`` processes, same API as VecEnv."""

    def __init__(
        self,
        env_specs: list[tuple[str, EnvConfig]],
        n_workers: int = 4,
        max_path_length: int | None = None,
    ):
        self.n_envs = len(env_specs)
        n_workers = min(n_workers, self.n_envs)
        ctx = mp.get_context("spawn")
        chunks = [env_specs[i::n_workers] for i in range(n_workers)]
        self._chunk_index = [list(range(self.n_envs))[i::n_workers] for i in range(n_workers)]
        self._remotes, self._procs = [], []
        for chunk in chunks:
            remote, work_remote = ctx.Pipe()
            proc = ctx.Process(target=_worker, args=(work_remote, remote, chunk), daemon=True)
            proc.start()
            work_remote.close()
            self._remotes.append(remote)
            self._procs.append(proc)
        self._remotes[0].send(("spaces", None))
        self.observation_space, self.action_space = self._remotes[0].recv()
        self.max_path_length = max_path_length
        self._steps = np.zeros(self.n_envs, np.int64)

    def _scatter(self, cmd, per_env_data=None):
        for remote, idxs in zip(self._remotes, self._chunk_index):
            data = [per_env_data[i] for i in idxs] if per_env_data is not None else None
            remote.send((cmd, data))

    def _gather(self):
        results = [None] * self.n_envs
        for remote, idxs in zip(self._remotes, self._chunk_index):
            for i, r in zip(idxs, remote.recv()):
                results[i] = r
        return results

    def seed(self, seed: int) -> None:
        for k, remote in enumerate(self._remotes):
            remote.send(("seed", seed + 1000 * k))
        for remote in self._remotes:
            remote.recv()

    def reset(self) -> np.ndarray:
        self._steps[:] = 0
        self._scatter("reset")
        return np.stack(self._gather())

    def step(self, actions: np.ndarray):
        self._scatter("step", list(actions))
        results = self._gather()
        obs, rewards, dones, infos = [], [], [], []
        reset_needed = []
        for i, (o, r, d, info) in enumerate(results):
            self._steps[i] += 1
            if self.max_path_length is not None and self._steps[i] >= self.max_path_length:
                d = True
            if d:
                reset_needed.append(i)
                self._steps[i] = 0
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(info)
        if reset_needed:
            # reset only the finished envs, addressed by worker-local index
            need = set(reset_needed)
            waiting = []
            for remote, idxs in zip(self._remotes, self._chunk_index):
                local = [j for j, i in enumerate(idxs) if i in need]
                if local:
                    remote.send(("reset_some", local))
                    waiting.append((remote, idxs))
            for remote, idxs in waiting:
                for j, o in remote.recv().items():
                    obs[idxs[j]] = o
        return np.stack(obs), np.asarray(rewards, np.float64), np.asarray(dones), infos

    def close(self) -> None:
        try:
            for remote in self._remotes:
                remote.send(("close", None))
            for remote in self._remotes:
                remote.recv()
        except (BrokenPipeError, EOFError):
            pass
        for proc in self._procs:
            proc.join(timeout=5)
