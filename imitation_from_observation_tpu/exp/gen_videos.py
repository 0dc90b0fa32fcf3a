"""Demo-video generation: roll out an expert and record mp4 demos.

Capability match for reference ``scripts/gen_videos.py`` + the gym monitor's
ffmpeg recorder (gym/monitoring/video_recorder.py): each episode renders
every step from a randomized viewpoint/context and is written as a 51-frame
mp4 (initial frame + 50 steps — the frame count the trainer's ingest filters
on, train_script.py:70), named ``video%05d.mp4``. Episodes report
``reward_true`` so bad demos can be filtered.
"""

from __future__ import annotations

import os

import numpy as np

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.core.log import get_logger
from imitation_from_observation_tpu.core.rng import RngStream
from imitation_from_observation_tpu.sim import NormalizedEnv, make_env
from imitation_from_observation_tpu.video.io import write_mp4


def record_rollout(
    env, policy, horizon: int, rng: RngStream, record_size=(500, 500), n_viewpoints: int = 1
):
    """Roll out and capture a full-rate frame sequence: [horizon+1, H, W, 3],
    or [horizon+1, V, H, W, 3] when ``n_viewpoints > 1`` (every configured
    camera rendered at every step of the SAME trajectory — multi-viewpoint
    scoring needs demo coverage of each azimuth it scores at)."""
    base = env.env if isinstance(env, NormalizedEnv) else env

    def snap():
        if n_viewpoints <= 1:
            return base.render(0, record_size)
        return np.stack([base.render(v, record_size) for v in range(n_viewpoints)])

    obs = env.reset()
    frames = [snap()]
    total_true = 0.0
    for _ in range(horizon):
        action, _ = policy.get_action(np.asarray(obs), rng.next())
        obs, _, done, info = env.step(action)
        frames.append(snap())
        total_true += float(info.get("reward_true", 0.0))
        if done:
            break
    return np.stack(frames), total_true


def generate_demo_videos_vec(
    task: str,
    policy,
    out_dir: str,
    n_videos: int,
    horizon: int = 50,
    env_overrides: dict | None = None,
    seed: int = 0,
    n_envs: int = 50,
    frame_backend: str = "tpu",
    min_true_reward: float | None = None,
) -> list[str]:
    """Batched demo recording on the native vectorized envs: N episodes run
    in lockstep, every step of all envs rendered in one batched call (the
    on-device raycast renderer by default), one mp4 per episode.

    Replaces the one-env-per-video loop (reference gen_videos.py:34-45) for
    large demo counts — 2,000+ videos in minutes instead of hours. Each
    episode gets a fresh context AND fresh camera azimuths (the reference
    made a new env per video, so viewpoints resample per episode). With
    ``n_viewpoints > 1`` in the env config (pinned multi-camera scenes, e.g.
    the real-pusher recipe) each episode yields one mp4 per viewpoint so the
    translation training set covers every azimuth the reward engine scores
    at.
    """
    import json

    from imitation_from_observation_tpu.core.config import EnvConfig
    from imitation_from_observation_tpu.sim import make_native_vec

    log = get_logger()
    os.makedirs(out_dir, exist_ok=True)
    rng = RngStream(seed)
    env_kw = dict(render_frames=True, horizon=horizon, seed=seed)
    env_kw.update(env_overrides or {})
    cfg = EnvConfig(name=task, **env_kw)
    vec = make_native_vec(
        task,
        n_envs,
        cfg,
        max_path_length=horizon,
        frame_backend=frame_backend,
        frames_mode="all",
        resample_cameras=True,
    )
    written, trues = [], []
    i = 0
    rounds = 0
    max_rounds = 10 * ((n_videos + n_envs - 1) // n_envs)
    while len(written) < n_videos and rounds < max_rounds:
        rounds += 1
        obs = vec.reset()
        frames = [vec.render_frames()]  # initial frame (51-frame demos)
        ep_true = np.zeros(n_envs)
        for _ in range(horizon):
            actions, _ = policy.get_actions(obs, rng.next())
            obs, _, _, infos = vec.step(actions)
            frames.append(np.stack([inf["frames"] for inf in infos]))
            ep_true += [inf["reward_true"] for inf in infos]
        clips = np.stack(frames, 1)  # [n_envs, horizon+1, V, H, W, 3]
        # one mp4 per (episode, viewpoint): multi-viewpoint scoring translates
        # demos into EVERY azimuth's context, so the training set must cover
        # each camera's views (base.py:195-226 per-vp means; with random
        # per-episode cameras the reference's demo set spans the azimuth
        # range the same way)
        for e in range(n_envs):
            if len(written) >= n_videos:
                break
            if min_true_reward is not None and ep_true[e] < min_true_reward:
                continue
            for v in range(clips.shape[2]):
                if len(written) >= n_videos:
                    break
                path = os.path.join(out_dir, f"video{i:05d}.mp4")
                write_mp4(path, clips[e, :, v])
                written.append(path)
                trues.append(float(ep_true[e]))
                i += 1
        log.log(
            f"recorded {len(written)}/{n_videos} demos "
            f"(mean reward_true {np.mean(trues) if trues else 0:.3f})"
        )
    vec.close()
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(
            dict(
                task=task,
                n_videos=len(written),
                horizon=horizon,
                episode_true_rewards=trues,
                videos=[os.path.basename(p) for p in written],
            ),
            f,
            indent=1,
        )
    log.log(f"done: {len(written)} demos, mean reward_true {np.mean(trues) if trues else 0:.3f}")
    return written


def generate_demo_videos(
    task: str,
    policy,
    out_dir: str,
    n_videos: int,
    horizon: int = 50,
    record_size: tuple[int, int] = (500, 500),
    env_overrides: dict | None = None,
    seed: int = 0,
    min_true_reward: float | None = None,
) -> list[str]:
    """Each video gets a fresh env (new random viewpoint + context), like the
    reference's per-episode monitor loop (gen_videos.py:34-45)."""
    import json

    log = get_logger()
    os.makedirs(out_dir, exist_ok=True)
    rng = RngStream(seed)
    env_kw = dict(render_frames=False, horizon=horizon)
    env_kw.update(env_overrides or {})
    written = []
    trues = []
    i = 0
    attempts = 0
    nvp = max(1, int(env_kw.get("n_viewpoints", 1)))
    while len(written) < n_videos and attempts < 10 * n_videos:
        attempts += 1
        env = NormalizedEnv(make_env(task, EnvConfig(name=task, seed=seed + attempts, **env_kw)))
        frames, total_true = record_rollout(
            env, policy, horizon, rng, record_size, n_viewpoints=nvp
        )
        env.close()
        if min_true_reward is not None and total_true < min_true_reward:
            continue
        # one mp4 per viewpoint of the trajectory (see generate_demo_videos_vec)
        for clip in [frames] if nvp == 1 else [frames[:, v] for v in range(nvp)]:
            if len(written) >= n_videos:
                break
            path = os.path.join(out_dir, f"video{i:05d}.mp4")
            write_mp4(path, clip)
            written.append(path)
            trues.append(total_true)
            i += 1
        if i % 10 == 0:
            log.log(f"recorded {i}/{n_videos} demos (mean reward_true {np.mean(trues):.3f})")
    # episode-stats manifest (the gym monitor's stats json,
    # gym/monitoring/stats_recorder.py): per-episode true return + lengths
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(
            dict(
                task=task,
                n_videos=len(written),
                horizon=horizon,
                episode_true_rewards=trues,
                videos=[os.path.basename(p) for p in written],
            ),
            f,
            indent=1,
        )
    log.log(f"done: {len(written)} demos, mean reward_true {np.mean(trues) if trues else 0:.3f}")
    return written
