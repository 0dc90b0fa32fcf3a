"""Experiment launchers for the five benchmark configs (BASELINE.json):

1. reach  — Reacher3DOF context translation (+ visual-reward TRPO)
2. push   — Pusher3DOF translation training + feature/pixel L2 reward TRPO
3. sweep  — Cleaner multi-context translation with held-out-context eval
4. strike — Striker, incl. the Inception-feature variant
5. real   — real-to-sim pushing through Inception features

Replaces the reference's ``sandbox/andrew/run_trpo_*.py`` +
``run_train_*.py`` launcher scripts and the stub/pickle dispatch of
``rllab/misc/instrument.py``: each stage is a typed function over
``ExperimentConfig``; ``run_pipeline`` chains expert -> demos -> translation
-> visual TRPO end to end.
"""

from __future__ import annotations

import os

import numpy as np

from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    RewardConfig,
    RLConfig,
    TrainConfig,
    TranslationModelConfig,
    preset,
)
from imitation_from_observation_tpu.reward import VisualRewardEngine
from imitation_from_observation_tpu.rl import (
    BatchPolopt,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
    TRPO,
    ZeroBaseline,
)
from imitation_from_observation_tpu.sim import NormalizedEnv, make_env, make_vec_env
from imitation_from_observation_tpu.train import TranslationTrainer
from imitation_from_observation_tpu.video.dataset import build_video_dataset


def ensure_vdata(log_dir: str, cfg: ExperimentConfig):
    """vdata for a completed recipe dir: load ``translation/vdata.npy`` if
    present, else rebuild it from the recorded demo mp4s with the recipe's
    own dataset params and re-cache. The multi-GB vdata cache is gitignored;
    ``videos/`` is the durable artifact it deterministically derives from
    (same decode order/seed -> same array)."""
    path = os.path.join(log_dir, "translation", "vdata.npy")
    if os.path.exists(path):
        from imitation_from_observation_tpu.video.dataset import (
            load_vdata_cache,
            vdata_build_params,
        )

        cached = load_vdata_cache(
            path,
            vdata_build_params(
                cfg.train.n_videos, cfg.env.horizon + 1, cfg.train.n_skip,
                cfg.model.image_size, cfg.train.rescale, cfg.train.seed,
            ),
            mmap_mode="r",
        )
        if cached is not None:
            return cached
    return build_video_dataset(
        os.path.join(log_dir, "videos", "*.mp4"),
        image_size=cfg.model.image_size,
        n_videos=cfg.train.n_videos,
        video_len=cfg.env.horizon + 1,
        n_skip=cfg.train.n_skip,
        rescale=cfg.train.rescale,
        seed=cfg.train.seed,
        cache_path=path,
    )


def run_translation_training(
    cfg: ExperimentConfig, video_glob: str, vdata=None, resume: bool = False
):
    """Stage 2: train the context-translation model (== ModelTrainer.train).

    ``resume=True``: if the final-iteration checkpoint
    (``<log_dir>/translation/checkpoints/<n_iters>/``) already exists, load
    its params instead of re-training — lets the long recipe scripts retry
    past a completed 100k-step stage after a transient relay failure.
    """
    log_dir = os.path.join(cfg.log_dir, "translation")
    if vdata is None:
        vdata = build_video_dataset(
            video_glob,
            image_size=cfg.model.image_size,
            n_videos=cfg.train.n_videos,
            video_len=cfg.env.horizon + 1,  # initial frame + horizon steps (=51)
            n_skip=cfg.train.n_skip,
            rescale=cfg.train.rescale,
            seed=cfg.train.seed,
            cache_path=os.path.join(log_dir, "vdata.npy"),
        )
    trainer = TranslationTrainer(cfg.model, cfg.train, vdata, log_dir=log_dir)
    if resume:
        import glob as _glob

        from imitation_from_observation_tpu.core.checkpoint import load_pytree
        from imitation_from_observation_tpu.core.log import get_logger

        # the trainer rounds its loop total UP to a multiple of steps_per_call
        # (trainer.py's fused-scan path), so the final checkpoint dir can be
        # any numeric dir >= n_iters — accept the smallest such complete one
        ckroot = os.path.join(log_dir, cfg.train.checkpoint_dir)
        cand, partial = [], []
        for d in _glob.glob(os.path.join(ckroot, "*")):
            name = os.path.basename(d)
            if name.isdigit():
                hits = sorted(_glob.glob(os.path.join(d, "*.npz")))
                if hits:
                    (cand if int(name) >= cfg.train.n_iters else partial).append(
                        (int(name), hits[0])
                    )
        if cand:
            hit = min(cand)[1]
            params = load_pytree(hit[: -len(".npz")], trainer.state.params)
            trainer.state = trainer.state._replace(params=params)
            get_logger().log(
                f"translation: final checkpoint {hit} exists, skipping training"
            )
            return trainer
        if partial:
            # a crashed/killed run left intermediate checkpoints: continue
            # from the newest instead of burning the whole budget again.
            # Params + step counter restore (the fused path's per-step PRNG
            # keys on state.step, so batch sampling continues the original
            # sequence); Adam moments are NOT checkpointed — the optimizer
            # restarts with a brief warm-up transient, which beats a from-
            # scratch rerun for a frozen-purpose model by a wide margin.
            n0, hit = max(partial)
            params = load_pytree(hit[: -len(".npz")], trainer.state.params)
            trainer.state = trainer.state._replace(
                params=params, step=trainer.state.step + n0
            )
            get_logger().log(
                f"translation: resuming from partial checkpoint {hit} "
                f"(step {n0}/{cfg.train.n_iters}; optimizer state reset)"
            )
            trainer.train(cfg.train.n_iters - n0, start_iter=n0)
            return trainer
    trainer.train()
    return trainer


def _vec_env(cfg: ExperimentConfig, render: bool):
    env_kw = cfg.env.replace(render_frames=render)
    if cfg.env.frame_backend in ("tpu", "native"):
        # fully-native vectorized stepping (normalized actions built in);
        # frames from the on-device raycast renderer ("tpu") or shared EGL
        from imitation_from_observation_tpu.sim import make_native_vec

        return make_native_vec(
            cfg.env.name,
            cfg.rl.n_envs,
            env_kw.replace(seed=cfg.rl.seed),
            max_path_length=cfg.rl.max_path_length,
            frame_backend="tpu" if cfg.env.frame_backend == "tpu" else "egl",
            # modes "ours"/"oursinception" score frames on device — keep them
            # resident from raycast render through (backbone +) reward splice;
            # at 299x299 the per-step frame fetch alone was ~20 s/iteration
            device_frames=(
                render
                and cfg.env.frame_backend == "tpu"
                and cfg.reward.mode in ("ours", "oursinception")
            ),
        )

    def mk(i):
        return lambda: NormalizedEnv(make_env(cfg.env.name, env_kw.replace(seed=cfg.rl.seed + i)))

    return make_vec_env(
        [mk(i) for i in range(cfg.rl.n_envs)],
        max_path_length=cfg.rl.max_path_length,
        render_frames=render,
        backend="python" if cfg.env.frame_backend == "python" else "auto",
    )


def run_visual_trpo(
    cfg: ExperimentConfig,
    params=None,
    demo_data=None,
    feature_fn=None,
    resume_from: str | None = None,
):
    """Stage 3: reward-driven TRPO (== run_trpo_*.py with mode ours/oracle/
    inception...)."""
    log_dir = os.path.join(cfg.log_dir, "rl")
    render = cfg.reward.mode not in ("oracle", "none")
    vec = _vec_env(cfg, render)
    obs_dim = vec.observation_space.flat_dim
    act_dim = vec.action_space.flat_dim
    policy = GaussianMLPPolicy(
        obs_dim, act_dim, hidden=cfg.rl.policy_hidden, init_std=cfg.rl.init_std, seed=cfg.rl.seed
    )
    if resume_from:
        from imitation_from_observation_tpu.core.checkpoint import load_pytree

        policy.params = load_pytree(resume_from, policy.params)
    if feature_fn is None and cfg.reward.mode in ("oursinception", "inception", "inceptionsame"):
        from imitation_from_observation_tpu.reward.backbones import (
            make_inception_feature_fn,
            restore_sanity_check,
        )

        feature_fn = make_inception_feature_fn(
            layer=cfg.reward.inception_layer,
            npz_path=cfg.reward.backbone_npz or None,
            input_size=cfg.env.image_size,
        )
        if cfg.reward.backbone_npz:
            # the reference classified bird.jpg at startup to validate the
            # restore (base.py:86-89); log the top classes the moment real
            # weights are in play
            from imitation_from_observation_tpu.core.log import get_logger

            top = restore_sanity_check(cfg.reward.backbone_npz)
            get_logger().log(f"inception restore sanity check: top classes {list(top)}")
    import jax

    from imitation_from_observation_tpu.parallel import make_mesh

    # multi-chip: shard BOTH reward scoring and the TRPO update over the
    # mesh's data axis (params replicated, psum over ICI)
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    engine = VisualRewardEngine(
        cfg.reward,
        cfg.model,
        params=params,
        demo_data=demo_data,
        n_viewpoints=cfg.env.n_viewpoints,
        feature_fn=feature_fn,
        mesh=mesh,
    )
    baseline = LinearFeatureBaseline() if cfg.rl.baseline == "linear" else ZeroBaseline()
    algo = BatchPolopt(
        vec,
        policy,
        baseline,
        TRPO(
            policy,
            step_size=cfg.rl.step_size,
            cg_iters=cfg.rl.cg_iters,
            reg_coeff=cfg.rl.cg_damping,
            backtrack_ratio=cfg.rl.backtrack_ratio,
            max_backtracks=cfg.rl.max_backtracks,
            mesh=mesh,
        ),
        cfg.rl,
        reward_engine=engine,
        log_dir=log_dir,
    )
    history = algo.train()
    vec.close()
    if cfg.rl.use_best_iterate and algo.best is not None:
        # report/return the argmax-ReturnTrue iterate, the reference's
        # protocol across per-iteration snapshots (plots notebook)
        from imitation_from_observation_tpu.core.checkpoint import load_pytree
        from imitation_from_observation_tpu.core.log import get_logger

        policy.params = load_pytree(algo.best["path"], policy.params)
        get_logger().log(
            f"best iterate: itr {algo.best['itr']} "
            f"ReturnTrue {algo.best['ReturnTrue']:.4f} (policy restored)"
        )
    return policy, history


def sample_rl_context(task: str, seed: int = 0, nvp: int = 1) -> dict:
    """Draw the ONE fixed scene context an RL experiment runs in.

    The reference's launchers draw viewpoint/goal/colors/distractors ONCE
    per experiment and pin them into the env kwargs (`rand_reach`,
    run_trpo_reach.py:67-87; `rand_push`, run_trpo_push.py:68-85;
    `rand_strike`, run_trpo_strike.py:62-75; `rand_throw`,
    run_trpo_throw.py:62-67; `rand_sweep`, run_trpo_sweep.py:55-57) —
    context RANDOMIZATION lives in the demo videos; the RL scene is fixed,
    so the reward engine's demo-translation cache (built from the agent's
    context frame, base.py:195-226) matches every rollout. Returns
    EnvConfig override fields.

    ``nvp > 1`` pins that many DISTINCT camera azimuths (the reference's
    ``_kwargs['vp'][vid]`` list, striker.py:74-76) — multi-viewpoint scoring
    with one shared azimuth would just duplicate the same frame. The first
    azimuth and every other field reproduce the ``nvp=1`` draw for the same
    seed (extra azimuths come from later rng state), so an nvp=2 rerun is
    scene-identical to its single-view leg."""
    rng = np.random.default_rng(seed)

    def widen(ctx: dict) -> dict:
        if nvp <= 1 or "viewpoint" not in ctx:
            return ctx
        vp0 = ctx["viewpoint"]
        if np.isscalar(vp0):
            extra = rng.uniform(0.0, 360.0, nvp - 1)
            ctx["viewpoint"] = (float(vp0), *(float(a) for a in extra))
        return ctx

    def color() -> np.ndarray:
        c = rng.uniform(0, 1, 3)
        while np.linalg.norm(c - np.array([1.0, 0.0, 0.0])) < 0.5:
            c = rng.uniform(0, 1, 3)
        return c

    def distractor_geoms() -> tuple:
        geoms = []
        for _ in range(5):
            pos_x = rng.uniform(-0.9, 0.9)
            pos_y = rng.uniform(0.0, 1.0)
            rgba = color().tolist()
            isinv = 1.0 if rng.random() > 0.5 else 0.0
            geoms.append((tuple(rgba + [isinv]), pos_x, pos_y))
        return tuple(geoms)

    if task in ("reach", "reacher3dof"):
        vp = rng.uniform(0, 360)
        goal = (rng.uniform(-1.1, -0.5), rng.uniform(0.5, 1.1))
        armcolor = color()
        bgcolor = color()
        while np.linalg.norm(bgcolor - armcolor) < 0.5:
            bgcolor = rng.uniform(0, 1, 3)  # launcher retries BG (not arm)
        return widen(
            dict(
                viewpoint=float(vp),
                goal=goal,
                armcolor=tuple(armcolor.tolist() + [1.0]),
                bgcolor=tuple(bgcolor.tolist() + [1.0]),
                geoms=distractor_geoms(),
            )
        )
    if task in ("push", "pusher3dof"):
        while True:
            obj = (rng.uniform(-1.0, -0.4), rng.uniform(0.3, 1.2))
            goal = (rng.uniform(-1.2, -0.8), rng.uniform(0.8, 1.2))
            if np.linalg.norm(np.array(obj) - np.array(goal)) > 0.45:
                break
        geoms = distractor_geoms()
        return widen(
            dict(
                viewpoint=float(rng.uniform(0, 360)),
                object_pos=obj,
                goal=goal,
                geoms=geoms,
            )
        )
    if task in ("strike", "strike_inception", "striker"):
        vp = rng.uniform(0, 360, 10)  # launcher draws 10; nvp=1 uses the first
        ball = np.array([0.5, -0.175])
        while True:
            goal = np.array([rng.uniform(0.15, 0.7), rng.uniform(0.1, 1.0)])
            if np.linalg.norm(ball - goal) > 0.17:
                break
        viewpoint = (
            float(vp[0]) if nvp <= 1 else tuple(float(a) for a in vp[:nvp])
        )
        return dict(viewpoint=viewpoint, goal=tuple(goal.tolist()), view_angle=45.0)
    if task in ("throw", "thrower"):
        return widen(
            dict(
                viewpoint=float(rng.uniform(0, 360)),
                goal=(rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3)),
            )
        )
    if task in ("sweep", "cleaner"):
        return widen(dict(viewpoint=float(rng.uniform(0, 360))))
    if task in ("real", "pusher3dofreal"):
        return {}  # measured fixed scene comes from the launcher's SCENE dict
    raise ValueError(f"unknown task {task!r}")


def scene_overrides(env_cfg: EnvConfig) -> dict:
    """Scene/camera context that must flow into expert training and demo
    recording the way the reference's launcher kwargs flowed into
    ``env._kwargs`` (gym_env.py:55): fixed goal/object, colors, camera pose,
    viewpoints. Only ``None`` means unset — literal values like
    ``cam_dist=1.0`` must survive; ``n_viewpoints`` is excluded only at its
    default of 1."""
    keys = (
        "goal", "object_pos", "geoms", "bgcolor", "armcolor",
        "viewpoint", "view_angle", "cam_dist",
    )
    scene = {k: getattr(env_cfg, k) for k in keys if getattr(env_cfg, k) is not None}
    if env_cfg.n_viewpoints != 1:
        scene["n_viewpoints"] = env_cfg.n_viewpoints
    return scene


def run_pipeline(
    task: str,
    log_dir: str,
    n_demos: int = 40,
    expert_iters: int = 30,
    translation_iters: int = 2000,
    rl_iters: int = 10,
    scale: float = 1.0,
    seed: int = 0,
    cfg: ExperimentConfig | None = None,
    expert_npz: str | None = None,
    rl_context: dict | None = None,
    resume: bool = False,
):
    """The full paper pipeline at configurable scale: train oracle expert ->
    record demo videos -> train translation model -> visual-reward TRPO.
    Pass ``cfg`` to override the task preset (model/env sizes etc.).

    ``resume=True`` skips stages whose artifacts already exist (a trained
    expert npz, a complete demo video set, the final translation
    checkpoint) so a multi-stage recipe interrupted by a relay outage can
    be re-run without repeating finished work. Artifacts are matched by
    count/path only — delete the stage's directory after a config change.

    ``rl_context``: EnvConfig override fields pinning the RL stage to ONE
    fixed scene (viewpoint/goal/colors/distractors) the way the reference
    launchers did (see :func:`sample_rl_context`) — demo recording keeps
    its full per-episode randomization either way. When None, a context is
    drawn from :func:`sample_rl_context` with this ``seed``: the fixed-
    context protocol is REQUIRED for visual-RL learning (CLAUDE.md;
    re-randomized contexts cap reach at ~-0.95 vs -0.26 pinned), and the
    reward engine now rejects mixed-context batches outright.

    ``expert_npz``: skip expert training and load a saved expert instead —
    e.g. one extracted from the reference's shipped pickles
    (tools/extract_reference_experts.py); its ``full_state`` meta flag is
    honored when rolling out demos (the reference's push/reach experts
    observe the full-state obs variant, pusher3dof.py:121-134).
    """
    from imitation_from_observation_tpu.core.checkpoint import load_pytree
    from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos
    from imitation_from_observation_tpu.exp.train_expert import train_expert

    cfg = cfg or preset(task)
    cfg = cfg.replace(
        log_dir=log_dir,
        rl=cfg.rl.replace(n_iters=rl_iters, seed=seed),
        train=cfg.train.replace(n_iters=translation_iters, n_videos=n_demos, n_train=int(n_demos * 0.8)),
        reward=cfg.reward.replace(mode="ours", scale=scale),
    )
    scene = scene_overrides(cfg.env)
    demo_env_overrides: dict = dict(scene)
    if expert_npz:
        from imitation_from_observation_tpu.core.checkpoint import checkpoint_meta
        from imitation_from_observation_tpu.exp.train_expert import load_expert

        expert = load_expert(expert_npz)
        meta = checkpoint_meta(expert_npz)["meta"]
        if meta.get("full_state"):
            demo_env_overrides["full_state"] = True
    else:
        expert_path = os.path.join(log_dir, "expert")
        if resume and os.path.exists(expert_path + ".npz"):
            from imitation_from_observation_tpu.exp.train_expert import load_expert

            expert = load_expert(expert_path)
        else:
            expert_rl = RLConfig(
                batch_size=min(2000, 40 * cfg.env.horizon),
                max_path_length=cfg.env.horizon,
                n_iters=expert_iters,
                n_envs=20,
                # the expert learns from the DENSE task reward: moderate
                # exploration (init_std=10 is the sparse visual-RL setting,
                # run_trpo_push.py:144)
                init_std=1.0,
                seed=seed,
                snapshot_mode="none",
            )
            expert = train_expert(
                task,
                expert_path,
                rl=expert_rl,
                env_overrides=dict(horizon=cfg.env.horizon, **scene),
                log_dir=os.path.join(log_dir, "expert_logs"),
            )
    video_dir = os.path.join(log_dir, "videos")
    if resume:
        import glob as _glob

        # generate_demo_videos_vec caps the TOTAL file count at n_demos
        # across all viewpoints (one mp4 per (episode, viewpoint), but the
        # writer breaks once n_demos files exist) — a complete demo set is
        # n_demos mp4s regardless of n_viewpoints
        expected = n_demos
        have = len(_glob.glob(os.path.join(video_dir, "*.mp4")))
    else:
        expected, have = 1, 0
    if have >= expected:
        pass  # demo set complete from a previous attempt
    elif cfg.env.frame_backend in ("tpu", "native"):
        # batched demo recording through the SAME renderer the RL frames use
        # (reward scoring compares demo translations to agent frames — one
        # renderer for both keeps them in the same visual domain)
        from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec

        generate_demo_videos_vec(
            task,
            expert,
            video_dir,
            n_demos,
            horizon=cfg.env.horizon,
            seed=seed,
            env_overrides=dict(
                demo_env_overrides,
                image_size=cfg.env.image_size,
                render_size=cfg.env.render_size,
            ),
            n_envs=min(50, n_demos),
            frame_backend="tpu" if cfg.env.frame_backend == "tpu" else "egl",
        )
    else:
        generate_demo_videos(
            task,
            expert,
            video_dir,
            n_demos,
            horizon=cfg.env.horizon,
            seed=seed,
            env_overrides=demo_env_overrides or None,
        )
    trainer = run_translation_training(cfg, os.path.join(video_dir, "*.mp4"), resume=resume)
    # held-out demos -> reward engine demo data (reference modeldata npy)
    demo_data = trainer.valid_data
    if rl_context is None:
        rl_context = sample_rl_context(task, seed=seed)
    rl_cfg = cfg if not rl_context else cfg.replace(env=cfg.env.replace(**rl_context))
    policy, history = run_visual_trpo(rl_cfg, params=trainer.state.params, demo_data=demo_data)
    return dict(expert=expert, trainer=trainer, policy=policy, history=history)
