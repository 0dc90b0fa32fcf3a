"""The batch policy-optimization loop.

Reference ``rllab/algos/batch_polopt.py:117-143``: per iteration, obtain
samples -> (visual reward splice) -> process samples (GAE + baseline fit) ->
optimize policy -> snapshot + tabular dump. The reward engine slots in
between sampling and GAE exactly like ``BaseSampler.process_samples``
(rllab/sampler/base.py:166-257) did.
"""

from __future__ import annotations

from imitation_from_observation_tpu.core.checkpoint import SnapshotManager
from imitation_from_observation_tpu.core.config import RLConfig
from imitation_from_observation_tpu.core.log import Logger, get_logger
from imitation_from_observation_tpu.core.relay_coord import hold_for_bench
from imitation_from_observation_tpu.rl.gae import pad_paths_recurrent, process_paths
from imitation_from_observation_tpu.rl.sampler import VectorizedSampler


class BatchPolopt:
    def __init__(
        self,
        vec_env,
        policy,
        baseline,
        optimizer,  # TRPO or VPG
        config: RLConfig,
        reward_engine=None,  # optional: splices visual rewards into paths
        log_dir: str | None = None,
        logger: Logger | None = None,
        record_video_every: int = 0,  # gym-monitor-style eval recordings
        sampler=None,  # custom obtain_samples() source (e.g. DeviceSampler)
    ):
        self.vec_env = vec_env
        self.policy = policy
        self.baseline = baseline
        self.optimizer = optimizer
        self.cfg = config
        self.reward_engine = reward_engine
        self.log = logger or get_logger(log_dir)
        self.snapshots = SnapshotManager(
            (log_dir or "data") + "/snapshots", config.snapshot_mode, config.snapshot_gap
        )
        self.sampler = sampler or VectorizedSampler(
            vec_env, policy, config.batch_size, config.max_path_length, seed=config.seed
        )
        self.record_video_every = record_video_every
        self._video_dir = (log_dir or "data") + "/videos"
        # best-iterate tracking (the reference's protocol reported across
        # per-iteration snapshots, rllab/misc/logger.py:216-228 + plots nb)
        self.best: dict | None = None  # {"itr", "ReturnTrue", "path"}

    def train(self, n_iters: int | None = None) -> list[dict[str, float]]:
        history = []
        for itr in range(n_iters if n_iters is not None else self.cfg.n_iters):
            # hand the relay to a waiting bench between iterations (an RL
            # iteration is seconds; a full leg is minutes-to-hours)
            hold_for_bench()
            with self.log.prefix(f"itr #{itr} | "):
                with self.log.timed("Sample"):
                    paths, timings = self.sampler.obtain_samples()
                if self.reward_engine is not None:
                    with self.log.timed("RewardEval"):
                        self.reward_engine.process(paths)
                with self.log.timed("Process"):
                    samples = process_paths(
                        paths,
                        self.baseline,
                        self.cfg.discount,
                        self.cfg.gae_lambda,
                        self.cfg.center_adv,
                        self.cfg.positive_adv,
                        self.cfg.success_threshold,
                    )
                    if getattr(self.policy, "recurrent", False):
                        # recurrent optimizers consume padded [B, T] batches
                        # with a valids mask (reference base.py:289-343)
                        samples.update(
                            pad_paths_recurrent(samples["paths"], self.cfg.center_adv)
                        )
                # the iteration's diagnostics (ReturnTrue et al) were earned
                # by the PRE-update policy — snapshot those params for
                # best-iterate selection before optimizing
                pre_params = self.policy.params
                with self.log.timed("Optimize"):
                    opt_diag = self.optimizer.optimize(samples)
                self.snapshots.save(itr, self.policy.params, meta={"itr": itr})
                self._track_best(itr, samples["diagnostics"], pre_params)
                if self.record_video_every and itr % self.record_video_every == 0:
                    self._record_eval_video(itr)
                row = dict(Iteration=itr)
                row.update(samples["diagnostics"])
                row.update(opt_diag)
                row.update(timings)
                # visual-reward term decomposition (engine.py sets it per
                # scoring call): feat vs pixel cost, per viewpoint
                row.update(getattr(self.reward_engine, "last_diagnostics", None) or {})
                if self.best is not None:
                    row["BestReturnTrue"] = self.best["ReturnTrue"]
                    row["BestIteration"] = self.best["itr"]
                for k, v in row.items():
                    self.log.record_tabular(k, v)
                history.append(self.log.dump_tabular())
        return history

    def _track_best(self, itr: int, diagnostics: dict, params) -> None:
        """Keep a ``best`` snapshot of the argmax-ReturnTrue iterate (the
        reference's plots notebook read the best across itr_N.pkl snapshots)."""
        rt = diagnostics.get("ReturnTrue")
        if rt is None:
            return
        if self.best is None or rt > self.best["ReturnTrue"]:
            from imitation_from_observation_tpu.core.checkpoint import save_pytree

            import os

            path = os.path.join(self.snapshots.directory, "best")
            save_pytree(path, params, step=itr, meta={"itr": itr, "ReturnTrue": rt})
            self.best = {"itr": itr, "ReturnTrue": rt, "path": path}

    def _record_eval_video(self, itr: int) -> None:
        """Record one evaluation rollout as mp4 (the gym monitor's periodic
        video schedule, gym/monitoring/monitor.py capability)."""
        from imitation_from_observation_tpu.core.rng import RngStream
        from imitation_from_observation_tpu.exp.gen_videos import record_rollout
        from imitation_from_observation_tpu.video.io import write_mp4

        env = self.vec_env.envs[0]
        # a PRIVATE stream (not the sampler's): the recorder must be a pure
        # observer — drawing from the shared stream would make every training
        # rollout after the first video differ between runs with and without
        # video recording at the same seed
        frames, total_true = record_rollout(
            env, self.policy, self.cfg.max_path_length,
            RngStream(self.cfg.seed + 7919 + itr),
        )
        import os

        write_mp4(os.path.join(self._video_dir, f"itr_{itr:05d}.mp4"), frames)
        self.log.log(f"recorded eval video itr {itr} (reward_true {total_true:.3f})")
