"""Experiment-layer tests: variants, expert training, demo recording,
viskit-lite aggregation, runner spec round-trip — and the full tiny pipeline."""

import json
import os

import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import EnvConfig, RLConfig
from imitation_from_observation_tpu.exp import (
    VariantGenerator,
    generate_demo_videos,
    train_expert,
)
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.exp.viskit_lite import group_curves, load_experiments


def test_variant_generator():
    vg = VariantGenerator()
    vg.add("seed", [1, 2])
    vg.add("scale", [0.1, 1.0])
    vg.add("name", lambda v: [f"s{v['seed']}"])  # dependent axis
    vs = vg.variants()
    assert len(vs) == 4
    assert {v["seed"] for v in vs} == {1, 2}
    assert all(v["name"] == f"s{v['seed']}" for v in vs)


def test_train_expert_and_demo_videos(tmp_path):
    rl = RLConfig(
        batch_size=120, max_path_length=6, n_iters=2, n_envs=4, snapshot_mode="none",
        policy_hidden=(8,), init_std=1.0,
    )
    expert_path = str(tmp_path / "expert")
    policy = train_expert(
        "pusher3dof", expert_path, rl=rl, env_overrides=dict(horizon=6),
        log_dir=str(tmp_path / "logs"),
    )
    assert os.path.exists(expert_path + ".npz")
    # round-trip load
    loaded = load_expert(expert_path)
    a1, _ = policy.get_action(np.zeros(policy.obs_dim, np.float32), __import__("jax").random.key(0))
    a2, _ = loaded.get_action(np.zeros(policy.obs_dim, np.float32), __import__("jax").random.key(0))
    np.testing.assert_allclose(a1, a2, rtol=1e-5)

    videos = generate_demo_videos(
        "pusher3dof", policy, str(tmp_path / "videos"), n_videos=2, horizon=6,
        record_size=(64, 64), seed=0,
    )
    assert len(videos) == 2
    from imitation_from_observation_tpu.video.io import decode_video

    frames = decode_video(videos[0])
    assert frames.shape[0] == 7  # horizon+1 frames (51 at full scale)


def test_viskit_lite(tmp_path):
    for seed in [1, 2]:
        d = tmp_path / f"exp_s{seed}"
        d.mkdir()
        with open(d / "progress.csv", "w") as f:
            f.write("Iteration,AverageReturn\n")
            for i in range(5):
                f.write(f"{i},{seed * 10 + i}\n")
        with open(d / "variant.json", "w") as f:
            json.dump({"seed": seed, "algo": "trpo"}, f)
    exps = load_experiments(str(tmp_path))
    assert len(exps) == 2
    curves = group_curves(exps, "AverageReturn", group_by="algo")
    x, mean, std = curves["trpo"]
    np.testing.assert_allclose(mean, [15, 16, 17, 18, 19])
    assert std[0] == 5.0
    # plotting writes a png
    from imitation_from_observation_tpu.exp.viskit_lite import plot

    out = plot(str(tmp_path), "AverageReturn", str(tmp_path / "p.png"), group_by="seed")
    assert os.path.exists(out)


def test_viskit_dashboard_server(tmp_path):
    """The interactive dashboard (reference rllab/viskit Flask frontend
    role): serves the selector page and renders plots over HTTP."""
    import threading
    import urllib.request

    for seed in [1, 2]:
        d = tmp_path / f"exp_s{seed}"
        d.mkdir()
        with open(d / "progress.csv", "w") as f:
            f.write("Iteration,ReturnTrue\n")
            for i in range(4):
                f.write(f"{i},{-1 + 0.1 * i * seed}\n")
        with open(d / "variant.json", "w") as f:
            json.dump({"seed": seed}, f)

    from imitation_from_observation_tpu.exp.viskit_lite import serve

    server = serve(str(tmp_path), port=0, y_default="ReturnTrue")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(f"http://127.0.0.1:{port}/?group_by=seed").read().decode()
        assert "viskit-lite" in html and "ReturnTrue" in html and "exp_s1" in html
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/plot.png?y=ReturnTrue&group_by=seed"
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()


def test_run_experiment_spec(tmp_path):
    from imitation_from_observation_tpu.exp.run_experiment import run_spec

    spec = dict(
        launcher="train_expert",
        log_dir=str(tmp_path),
        kwargs=dict(
            task="pusher3dof",
            out_path=str(tmp_path / "expert"),
            rl=RLConfig(batch_size=60, max_path_length=6, n_iters=1, n_envs=2,
                        snapshot_mode="none", policy_hidden=(8,), init_std=1.0),
            env_overrides=dict(horizon=6),
            log_dir=str(tmp_path / "logs"),
        ),
    )
    # kwargs with a dataclass can't go through json; run inline
    run_spec(spec)
    assert os.path.exists(tmp_path / "expert.npz")
    assert os.path.exists(tmp_path / "variant.json")


def test_full_pipeline_tiny(tmp_path):
    """The complete paper pipeline (expert -> demos -> translation -> visual
    TRPO) at toy scale — the framework's 'does everything connect' test."""
    from imitation_from_observation_tpu.core.config import (
        ExperimentConfig,
        RewardConfig,
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import run_pipeline

    hw, horizon = 16, 6
    cfg = ExperimentConfig(
        name="tiny_push",
        env=EnvConfig(name="pusher3dof", image_size=(hw, hw), render_size=(64, 64), horizon=horizon),
        model=TranslationModelConfig(model="context_skip", image_size=(hw, hw), base_filters=8, feat_size=32),
        train=TrainConfig(batch_size=8, eval_every=4, save_every=1000, log_every=100),
        rl=RLConfig(batch_size=2 * horizon, max_path_length=horizon, n_envs=2, snapshot_mode="none", policy_hidden=(8,)),
        reward=RewardConfig(mode="ours", scale=0.1),
    )
    out = run_pipeline(
        "pusher3dof",
        str(tmp_path),
        n_demos=6,
        expert_iters=1,
        translation_iters=4,
        rl_iters=1,
        seed=0,
        cfg=cfg,
    )
    assert len(out["history"]) == 1
    assert np.isfinite(out["history"][0]["AverageReturn"])
    # all stages left artifacts
    assert os.path.exists(tmp_path / "expert.npz")
    assert sum(f.endswith(".mp4") for f in os.listdir(tmp_path / "videos")) == 6
    assert (tmp_path / "videos" / "stats.json").exists()
    assert os.path.exists(tmp_path / "translation" / "vdata.npy")
    assert os.path.exists(tmp_path / "rl" / "progress.csv")


def test_pipeline_resume_skips_completed_stages(tmp_path):
    """``run_pipeline(resume=True)`` must not repeat finished stages: the
    trained expert, a complete demo set, and the final translation
    checkpoint are reused (relay outages interrupt the multi-hour recipe
    scripts; retries should only pay for the missing stages)."""
    from imitation_from_observation_tpu.core.config import (
        ExperimentConfig,
        RewardConfig,
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import run_pipeline

    hw, horizon = 16, 6
    cfg = ExperimentConfig(
        name="tiny_resume",
        env=EnvConfig(name="pusher3dof", image_size=(hw, hw), render_size=(64, 64), horizon=horizon),
        model=TranslationModelConfig(model="context_skip", image_size=(hw, hw), base_filters=8, feat_size=32),
        # save_every == n_iters so the FINAL checkpoint exists for resume
        train=TrainConfig(batch_size=8, eval_every=4, save_every=4, log_every=100),
        rl=RLConfig(batch_size=2 * horizon, max_path_length=horizon, n_envs=2, snapshot_mode="none", policy_hidden=(8,)),
        reward=RewardConfig(mode="ours", scale=0.1),
    )
    kw = dict(n_demos=6, expert_iters=1, translation_iters=4, rl_iters=1, seed=0, cfg=cfg)
    run_pipeline("pusher3dof", str(tmp_path), **kw)

    ckdir = tmp_path / "translation" / "checkpoints" / "4"
    ckpts = [f for f in os.listdir(ckdir) if f.endswith(".npz")]
    assert ckpts, "final-iteration checkpoint must exist for resume to engage"

    def mtimes():
        stamps = {"expert": os.path.getmtime(tmp_path / "expert.npz")}
        for f in os.listdir(tmp_path / "videos"):
            if f.endswith(".mp4"):
                stamps[f] = os.path.getmtime(tmp_path / "videos" / f)
        stamps["ckpt"] = os.path.getmtime(ckdir / ckpts[0])
        return stamps

    before = mtimes()
    out = run_pipeline("pusher3dof", str(tmp_path), resume=True, **kw)
    # the RL stage still ran; everything upstream was reused untouched
    assert len(out["history"]) == 1
    assert np.isfinite(out["history"][0]["AverageReturn"])
    assert mtimes() == before


def test_sample_rl_context():
    """The fixed-context sampler mirrors the reference launchers' rand_*()
    (run_trpo_reach.py:67-87 et al.): deterministic per seed, fields map to
    EnvConfig, ranges match the env's own reset distributions."""
    from imitation_from_observation_tpu.exp.launchers import sample_rl_context

    a = sample_rl_context("reach", seed=3)
    b = sample_rl_context("reach", seed=3)
    assert a == b
    assert a != sample_rl_context("reach", seed=4)
    assert 0 <= a["viewpoint"] <= 360
    assert -1.1 <= a["goal"][0] <= -0.5 and 0.5 <= a["goal"][1] <= 1.1
    assert len(a["geoms"]) == 5 and all(len(g[0]) == 4 for g in a["geoms"])
    assert len(a["armcolor"]) == 4 and a["armcolor"][3] == 1.0
    # every field is a real EnvConfig knob
    cfg = EnvConfig(name="reacher3dof", **a)
    assert cfg.viewpoint == a["viewpoint"]
    p = sample_rl_context("push", seed=0)
    assert np.linalg.norm(np.array(p["object_pos"]) - np.array(p["goal"])) > 0.45
    s = sample_rl_context("strike", seed=0)
    assert s["view_angle"] == 45.0
    EnvConfig(name="striker", **s)
    assert sample_rl_context("sweep", seed=0).keys() == {"viewpoint"}
    assert sample_rl_context("real", seed=0) == {}
    t = sample_rl_context("throw", seed=0)
    assert all(-0.3 <= g <= 0.3 for g in t["goal"])


def test_full_pipeline_tiny_tpu_backend(tmp_path):
    """The pipeline on the fully-native vec path: batched native stepping +
    the on-device raycast renderer for BOTH demo recording and RL frames
    (EnvConfig.frame_backend='tpu')."""
    from imitation_from_observation_tpu.core.config import (
        ExperimentConfig,
        RewardConfig,
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import run_pipeline

    hw, horizon = 16, 6
    cfg = ExperimentConfig(
        name="tiny_reach_tpu",
        env=EnvConfig(
            name="reacher3dof", image_size=(hw, hw), render_size=(64, 64),
            horizon=horizon, frame_backend="tpu",
        ),
        model=TranslationModelConfig(model="context_skip", image_size=(hw, hw), base_filters=8, feat_size=32),
        train=TrainConfig(batch_size=8, eval_every=4, save_every=1000, log_every=100),
        rl=RLConfig(batch_size=4 * horizon, max_path_length=horizon, n_envs=4, snapshot_mode="none", policy_hidden=(8,)),
        reward=RewardConfig(mode="ours", scale=0.1),
    )
    out = run_pipeline(
        "reacher3dof",
        str(tmp_path),
        n_demos=6,
        expert_iters=1,
        translation_iters=4,
        rl_iters=2,
        seed=0,
        cfg=cfg,
    )
    assert len(out["history"]) == 2
    for h in out["history"]:
        assert np.isfinite(h["AverageReturn"]) and np.isfinite(h["ReturnTrue"])
    assert sum(f.endswith(".mp4") for f in os.listdir(tmp_path / "videos")) == 6
    assert (tmp_path / "videos" / "stats.json").exists()
    assert os.path.exists(tmp_path / "rl" / "progress.csv")


def test_ablation_trainer(tmp_path):
    """Loss ablations: L2L3 trains on recon1 only and still runs end-to-end."""
    from imitation_from_observation_tpu.exp.ablations import run_ablation

    rng = np.random.default_rng(0)
    vdata = rng.uniform(-1, 1, (4, 8, 16, 16, 3)).astype(np.float32)
    tr = run_ablation(
        "push", "L2L3", vdata, log_dir=str(tmp_path), n_iters=3, batch_size=8,
        model_overrides=dict(image_size=(16, 16), base_filters=8, feat_size=32),
        train_overrides=dict(eval_every=3, log_every=10),
    )
    assert int(tr.state.step) == 3
    assert tr.model_cfg.loss_ablation == "L2L3"


def test_loss_ablation_combos():
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models import ContextSkip, translation_loss

    model = ContextSkip(base_filters=8, feat_size=32, image_size=(16, 16))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    losses = {
        abl: float(translation_loss(outs, x, ablation=abl)[0])
        for abl in ["none", "L2", "L2L3", "L1"]
    }
    _, m = translation_loss(outs, x)
    r1, r2, sim = float(m["recon1"]), float(m["recon2"]), float(m["simloss"])
    np.testing.assert_allclose(losses["none"], r1 + r2 + sim, rtol=1e-5)
    np.testing.assert_allclose(losses["L2"], r1 + r2, rtol=1e-5)
    np.testing.assert_allclose(losses["L2L3"], r1, rtol=1e-5)
    np.testing.assert_allclose(losses["L1"], r2 + sim, rtol=1e-5)


def test_run_visual_trpo_resume(tmp_path):
    """resume_from restores policy params into a fresh launcher run
    (scripts/resume_training.py capability)."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.core.checkpoint import save_pytree
    from imitation_from_observation_tpu.core.config import (
        ExperimentConfig, RewardConfig, TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import run_visual_trpo
    from imitation_from_observation_tpu.rl import GaussianMLPPolicy

    hw, horizon = 16, 4
    donor = GaussianMLPPolicy(obs_dim=6, action_dim=3, hidden=(32, 32), init_std=1.0, seed=7)
    ck = str(tmp_path / "donor")
    save_pytree(ck, donor.params)
    cfg = ExperimentConfig(
        name="resume_test",
        log_dir=str(tmp_path),
        env=EnvConfig(name="pusher3dof", image_size=(hw, hw), render_size=(64, 64), horizon=horizon),
        rl=RLConfig(batch_size=8, max_path_length=horizon, n_envs=2, n_iters=0, snapshot_mode="none"),
        reward=RewardConfig(mode="oracle"),
    )
    policy, history = run_visual_trpo(cfg, resume_from=ck)
    np.testing.assert_allclose(
        np.asarray(policy.params["log_std"]), np.asarray(donor.params["log_std"])
    )
    assert history == []


def test_scene_overrides_propagation():
    """Scene/camera config must reach expert/demo envs; only None is unset
    (a cam_dist/viewpoint literally equal to 1 must survive — regression for
    the `not in (None, 1)` filter bug)."""
    from imitation_from_observation_tpu.core.config import EnvConfig
    from imitation_from_observation_tpu.exp.launchers import scene_overrides

    env = EnvConfig(
        name="pusher3dofreal", cam_dist=1.0, viewpoint=1.0, view_angle=1,
        goal=(0.1, 0.2), object_pos=(0.0, 0.0),
    )
    scene = scene_overrides(env)
    assert scene == dict(
        cam_dist=1.0, viewpoint=1.0, view_angle=1, goal=(0.1, 0.2), object_pos=(0.0, 0.0)
    )
    assert "n_viewpoints" not in scene  # default 1 means unset
    assert scene_overrides(EnvConfig(name="reacher3dof")) == {}
    assert scene_overrides(EnvConfig(name="striker", n_viewpoints=2)) == {"n_viewpoints": 2}


def test_sample_rl_context_nvp():
    """nvp>1 pins DISTINCT per-viewpoint azimuths (the reference's
    _kwargs['vp'][vid] list, striker.py:74-76) while reproducing the nvp=1
    scene exactly — an nvp=2 rerun stays scene-identical to its
    single-view leg."""
    from imitation_from_observation_tpu.exp.launchers import sample_rl_context

    for task in ("push", "reach", "strike", "sweep", "throw"):
        one = sample_rl_context(task, seed=1)
        two = sample_rl_context(task, seed=1, nvp=2)
        vps = two["viewpoint"]
        assert len(vps) == 2 and vps[0] != vps[1]
        assert vps[0] == one["viewpoint"]  # first azimuth is the nvp=1 draw
        for k in one:
            if k != "viewpoint":
                assert two[k] == one[k], (task, k)
    # strike takes azimuths from the launcher's 10-draw block, not new draws
    s3 = sample_rl_context("strike", seed=1, nvp=3)
    assert len(s3["viewpoint"]) == 3


def test_scalar_viewpoint_multi_vp_raises():
    """One shared azimuth with n_viewpoints>1 would score the same frame
    twice (the degeneracy behind the reclassified push rl_x2scale leg) —
    both env paths must refuse it loudly."""
    import pytest

    from imitation_from_observation_tpu.sim.native_tasks import make_native_vec
    from imitation_from_observation_tpu.sim.registry import make_env

    cfg = EnvConfig(
        name="pusher3dof", image_size=(16, 16), render_size=(64, 64),
        n_viewpoints=2, viewpoint=123.0, horizon=4, render_frames=True,
    )
    with pytest.raises(ValueError, match="duplicates the camera"):
        make_native_vec("pusher3dof", 2, cfg)
    env = make_env("pusher3dof", cfg)
    env.reset()
    with pytest.raises(ValueError, match="duplicates the camera"):
        env.render(0, (16, 16))
    env.close()
    # a per-viewpoint pair is accepted by both
    ok = cfg.replace(viewpoint=(123.0, 163.0))
    make_native_vec("pusher3dof", 2, ok).close()
    env = make_env("pusher3dof", ok)
    env.reset()
    assert env.render(1, (16, 16)).shape == (16, 16, 3)
    env.close()


def test_report_helpers(tmp_path):
    """summarize/done_rows (exp/report.py) — the shared run-reporting used
    by every full-recipe and variant-study script."""
    import csv

    from imitation_from_observation_tpu.exp.report import done_rows, summarize

    hist = [{"ReturnTrue": -1.0 + 0.1 * i, "SuccessRate": 0.1 * i} for i in range(12)]
    s = summarize(hist, "leg")
    assert s["best"] == hist[11]["ReturnTrue"] and s["best_iter"] == 11
    assert s["best_success"] == hist[11]["SuccessRate"]
    assert abs(s["first10_mean"] - sum(h["ReturnTrue"] for h in hist[:10]) / 10) < 1e-12

    assert done_rows(str(tmp_path), 3) is None  # no progress.csv yet
    rl = tmp_path / "rl"
    rl.mkdir()
    with open(rl / "progress.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["ReturnTrue", "SuccessRate"])
        w.writeheader()
        for h in hist[:2]:
            w.writerow(h)
    assert done_rows(str(tmp_path), 3) is None  # incomplete leg
    with open(rl / "progress.csv", "a", newline="") as f:
        w = csv.DictWriter(f, ["ReturnTrue", "SuccessRate"])
        w.writerow(hist[2])
    rows = done_rows(str(tmp_path), 3)
    assert [r["ReturnTrue"] for r in rows] == [h["ReturnTrue"] for h in hist[:3]]


def test_inception_feature_pipeline_launchers(tmp_path):
    """The launcher path of examples/strike_inception_demo.py stages 2-4 at
    CPU-tiny shapes: uint8 demos -> backbone feature maps ->
    run_translation_training(vdata=<features>) with model='context_feat'
    (run_train_strike_inception.py:39-43 role) -> run_visual_trpo with
    mode='oursinception' + explicit feature_fn (run_trpo_inception.py:70-173
    role). Also pins that build_model honors the config's feature_hw /
    feature_channels (the engine constructs its model from config alone)."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.core.config import (
        ExperimentConfig,
        RewardConfig,
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import (
        run_translation_training,
        run_visual_trpo,
    )
    from imitation_from_observation_tpu.models import build_model

    hw, horizon = 16, 6
    F_HW, F_C = 4, 8
    n_videos, n_train = 6, 4

    def feature_fn(frames_u8):  # stand-in backbone: avg-pool + channel tile
        x = jnp.asarray(frames_u8, jnp.float32) / 255.0 * 2 - 1
        x = x.reshape(x.shape[0], F_HW, hw // F_HW, F_HW, hw // F_HW, 3).mean(axis=(2, 4))
        return jnp.tile(x, (1, 1, 1, F_C // 3 + 1))[..., :F_C]

    cfg = ExperimentConfig(
        name="tiny_inception",
        log_dir=str(tmp_path),
        env=EnvConfig(
            name="pusher3dof", image_size=(hw, hw), render_size=(64, 64),
            horizon=horizon,
        ),
        model=TranslationModelConfig(
            model="context_feat", strides=(1, 2, 1, 2), kernels=(3, 3, 3, 3),
            filters=(8, 8, 8, 8), feat_size=16,
            feature_hw=(F_HW, F_HW), feature_channels=F_C,
        ),
        train=TrainConfig(
            batch_size=4, n_iters=3, n_videos=n_videos, n_train=n_train,
            eval_every=2, save_every=1000, log_every=100,
        ),
        rl=RLConfig(
            batch_size=2 * horizon, max_path_length=horizon, n_envs=2,
            n_iters=1, snapshot_mode="none", policy_hidden=(8,), init_std=1.0,
        ),
        reward=RewardConfig(mode="oursinception", scale=0.01, skip=1),
    )

    model = build_model(cfg.model)
    assert model.feature_hw == (F_HW, F_HW) and model.feature_channels == F_C

    # uint8 demo frames [T, N, H, W, C] and their backbone feature maps
    rng = np.random.default_rng(0)
    T = horizon // 2
    demo_u8 = rng.integers(0, 255, (T, n_videos, hw, hw, 3), dtype=np.uint8)
    feat_vdata = np.stack(
        [np.asarray(feature_fn(demo_u8[t]), np.float32) for t in range(T)]
    )
    assert feat_vdata.shape == (T, n_videos, F_HW, F_HW, F_C)

    trainer = run_translation_training(cfg, video_glob="", vdata=feat_vdata)
    assert int(trainer.state.step) == 3

    policy, history = run_visual_trpo(
        cfg,
        params=trainer.state.params,
        demo_data=demo_u8[:, n_train:],
        feature_fn=feature_fn,
    )
    assert len(history) == 1
    assert history[0]["AverageReturn"] < 0  # visual costs spliced
    assert np.isfinite(history[0]["ReturnTrue"])


def test_train_expert_saves_best_iterate(tmp_path):
    """train_expert must persist the argmax-ReturnTrue iterate, not the
    final params — TRPO experts can diverge late (observed on thrower:
    best -3.03 @ itr 16, final -6.36, demos recorded from final)."""
    import jax

    from imitation_from_observation_tpu.core.checkpoint import load_pytree

    rl = RLConfig(
        batch_size=120, max_path_length=6, n_iters=3, n_envs=4, snapshot_mode="none",
        policy_hidden=(8,), init_std=1.0,
    )
    expert_path = str(tmp_path / "expert")
    policy = train_expert(
        "pusher3dof", expert_path, rl=rl, env_overrides=dict(horizon=6),
        log_dir=str(tmp_path / "logs"),
    )
    best = load_pytree(str(tmp_path / "logs" / "snapshots" / "best"), policy.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(policy.params), jax.tree_util.tree_leaves(best)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_launch_bundle_generates_and_executes(tmp_path):
    """make_launch_bundle (instrument.py:455-520 local_docker/ec2 role):
    the generated bundle is complete (spec/launch/docker/metadata), the
    docker command references the image and code mount, and launch.sh
    actually executes the runner end-to-end — including the periodic sync's
    final sync-on-termination copying results to the sync destination."""
    import subprocess
    import sys

    from imitation_from_observation_tpu.exp.run_experiment import (
        make_launch_bundle,
        run_bundle,
    )

    log_dir = tmp_path / "exp"
    sync_dest = tmp_path / "synced"
    spec = dict(
        launcher="smoke", log_dir=str(log_dir),
        kwargs=dict(log_dir=str(log_dir), note="bundle-test"),
    )
    paths = make_launch_bundle(
        spec, str(tmp_path / "bundle"),
        docker_image="iofo-tpu:test", sync_dest=str(sync_dest),
        env={"IOFO_BUNDLE_TEST": "1"},
    )
    for k in ("spec", "launch", "docker", "metadata"):
        assert os.path.exists(paths[k]), k
    docker_cmd = open(paths["docker"]).read()
    assert "docker run" in docker_cmd and "iofo-tpu:test" in docker_cmd
    assert "/code" in docker_cmd
    launch = open(paths["launch"]).read()
    assert "IOFO_BUNDLE_TEST" in launch and "sync_results" in launch

    rc = run_bundle(str(tmp_path / "bundle"))
    assert rc == 0
    with open(log_dir / "smoke.json") as f:
        marker = json.load(f)
    assert marker["ok"] and marker["kwargs"]["note"] == "bundle-test"
    # sync-on-termination mirrored the results into the destination
    assert (sync_dest / "smoke.json").exists()

    # CLI bundle mode round-trips through json specs
    out = subprocess.run(
        [sys.executable, "-m", "imitation_from_observation_tpu.exp.run_experiment",
         "--launcher", "smoke", "--log-dir", str(tmp_path / "exp2"),
         "--mode", "bundle", "--bundle-dir", str(tmp_path / "bundle2")],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(tmp_path / "bundle2" / "launch.sh")


def test_fanout_bundles_per_variant(tmp_path):
    """Cluster scale-out artifacts: a VariantGenerator sweep becomes one
    executable bundle per variant (instrument.py batch_tasks/launch_ec2
    role); executing two of them produces independent per-variant logs."""
    from imitation_from_observation_tpu.exp.run_experiment import (
        make_fanout_bundles,
        run_bundle,
    )
    from imitation_from_observation_tpu.exp.variants import VariantGenerator

    vg = VariantGenerator().add("seed", [0, 1]).add("scale", [0.1, 1.0])
    base = dict(launcher="smoke", log_dir=str(tmp_path / "exp"), kwargs={})
    bundles = make_fanout_bundles(base, vg.variants(), str(tmp_path / "bundles"))
    assert len(bundles) == 4
    assert all(os.path.exists(b["launch"]) and os.path.exists(b["variant"]) for b in bundles)
    with open(bundles[3]["variant"]) as f:
        assert json.load(f) == {"seed": 1, "scale": 1.0}

    for i in (0, 3):
        assert run_bundle(os.path.dirname(bundles[i]["launch"])) == 0
        with open(tmp_path / "exp" / f"v{i}" / "smoke.json") as f:
            marker = json.load(f)
        assert marker["ok"]
    # distinct variants landed in distinct log dirs with their own kwargs
    with open(tmp_path / "exp" / "v3" / "smoke.json") as f:
        assert json.load(f)["kwargs"]["scale"] == "1.0"


def test_run_bundles_drains_fanout_across_workers(tmp_path):
    """run_bundles (batch_tasks scheduler role): every bundle under the root
    executes across N concurrent worker processes, per-bundle returncodes
    land in results.json, and the CLI drain mode reports the same map."""
    import subprocess
    import sys

    from imitation_from_observation_tpu.exp.run_experiment import (
        make_fanout_bundles,
        run_bundles,
    )
    from imitation_from_observation_tpu.exp.variants import VariantGenerator

    vg = VariantGenerator().add("seed", [0, 1, 2])
    base = dict(launcher="smoke", log_dir=str(tmp_path / "exp"), kwargs={})
    root = str(tmp_path / "bundles")
    make_fanout_bundles(base, vg.variants(), root)

    results = run_bundles(root, workers=2)
    assert results == {"v0": 0, "v1": 0, "v2": 0}
    for i in range(3):
        with open(tmp_path / "exp" / f"v{i}" / "smoke.json") as f:
            assert json.load(f)["ok"]
    with open(os.path.join(root, "results.json")) as f:
        assert json.load(f) == {"v0": 0, "v1": 0, "v2": 0}

    # CLI drain mode over a fresh fanout; exit code reflects the rc map
    make_fanout_bundles(base, vg.variants(), str(tmp_path / "bundles2"))
    out = subprocess.run(
        [sys.executable, "-m", "imitation_from_observation_tpu.exp.run_experiment",
         "--mode", "drain", "--bundle-root", str(tmp_path / "bundles2"),
         "--workers", "3"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout[out.stdout.index("{"):]) == {
        "v0": 0, "v1": 0, "v2": 0,
    }


def test_translation_partial_checkpoint_resume(tmp_path):
    """A killed translation run resumes from its newest partial checkpoint:
    numbering continues, only the remaining steps run, and the final
    checkpoint lands at n_iters (launchers.run_translation_training)."""
    import numpy as np

    from imitation_from_observation_tpu.core.config import (
        EnvConfig,
        ExperimentConfig,
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.exp.launchers import run_translation_training

    rng = np.random.default_rng(0)
    vdata = rng.uniform(-1, 1, (4, 6, 16, 16, 3)).astype(np.float32)
    model = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    mk = lambda n: ExperimentConfig(
        name="resume_test", log_dir=str(tmp_path),
        env=EnvConfig(name="reacher3dof"), model=model,
        train=TrainConfig(
            batch_size=4, n_iters=n, n_train=4, steps_per_call=2,
            eval_every=4, save_every=4, log_every=4,
        ),
    )
    # phase 1: a "crashed" run that only got through 4 of 12 iters
    run_translation_training(mk(4), video_glob="", vdata=vdata)
    ck = tmp_path / "translation" / "checkpoints"
    assert sorted(int(p.name) for p in ck.iterdir()) == [4]

    # phase 2: ask for the full 12 with resume — must continue from 4
    trainer = run_translation_training(mk(12), video_glob="", vdata=vdata, resume=True)
    assert sorted(int(p.name) for p in ck.iterdir()) == [4, 8, 12]
    assert int(trainer.state.step) == 12

    # phase 3: complete run short-circuits entirely
    t2 = run_translation_training(mk(12), video_glob="", vdata=vdata, resume=True)
    assert int(t2.state.step) == 0  # params loaded, no training ran
