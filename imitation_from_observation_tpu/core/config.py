"""Typed configuration objects.

The reference threads an untyped ``**kwargs`` dict through three side channels
(launcher dict -> ``BatchPolopt._kwargs`` -> ``env._kwargs``; see reference
``rllab/algos/batch_polopt.py:106`` and ``rllab/envs/gym_env.py:55``). Here a
single tree of frozen dataclasses replaces all of them; every consumer takes
the sub-config it needs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


class _Base:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, default=str)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TranslationModelConfig(_Base):
    """Config for the context-translation model family.

    Mirrors the knobs of the reference model zoo
    (``gym/envs/mujoco/arm_shaping.py``): image dims, feature size, filter
    widths, strides/kernels for the feature-space (inception) variant.
    """

    model: str = "context_skip"  # registry key, see models/zoo.py
    image_size: tuple[int, int] = (48, 48)  # (H, W)
    channels: int = 3
    feat_size: int = 1024  # latent z width (100 for context_small)
    base_filters: int = 64  # df_dim/gf_dim of the reference
    # context_feat (inception feature-space) variant:
    strides: tuple[int, ...] = (1, 2, 1, 2)
    kernels: tuple[int, ...] = (3, 3, 3, 3)
    filters: tuple[int, ...] = (1024, 1024, 512, 512)
    dropout_rate: float = 0.5  # context_small only (1 - keep_prob)
    # context_ae_inception (zoo feature-map model) knobs; None = the
    # reference defaults (8x8 Mixed_7c maps, 2048 channels, df_dim 256 —
    # arm_shaping.py:1686-1694). Explicit so pixel-model fields keep their
    # literal meaning (no sentinel reuse of image_size/channels/base_filters).
    feature_hw: tuple[int, int] | None = None
    feature_channels: int | None = None
    feature_filters: int | None = None
    sim_weight: float = 1e3  # simloss multiplier (arm_shaping.py:1345)
    loss_ablation: str = "none"  # none | L2 | L2L3 | L1 (ablations.py:175-182)
    dtype: str = "bfloat16"  # compute dtype on TPU; params are float32


@dataclass(frozen=True)
class TrainConfig(_Base):
    """Translation-model training loop config (reference scripts/train_script.py)."""

    batch_size: int = 100
    learning_rate: float = 1e-4
    # optional global-norm gradient clipping (optax.clip_by_global_norm)
    # before Adam. None matches the reference's bare Adam; set it for
    # heavy-tailed inputs (e.g. the random-init-backbone feature pipeline,
    # whose Adam diverges with recurring loss spikes unclipped).
    grad_clip_norm: float | None = None
    n_iters: int = 100_000
    save_every: int = 5_000
    eval_every: int = 40
    log_every: int = 4
    n_videos: int = 4000
    n_train: int = 3500
    video_len: int = 50  # frames per demo after dropping frame 0
    n_skip: int = 1  # temporal subsample (2 for sweep/real)
    rescale: bool = True  # [-1, 1] float frames (False feeds uint8 to inception)
    # keep the full video tensor device-resident and gather (src, tgt) pairs
    # on-device per step — no per-iteration host->HBM batch transfer (the
    # reference fed every batch through a feed_dict, train_script.py:163)
    on_device_data: bool = True
    # fuse K optimizer steps into one device call (lax.scan) — amortizes
    # host dispatch latency; requires on_device_data. log/eval cadence is
    # rounded to multiples of this.
    steps_per_call: int = 1
    # forward/backward compute dtype: "bfloat16" runs the conv trunks on the
    # MXU's native dtype (params, Adam state, and the loss reduction stay
    # float32 — standard mixed precision). Opt-in: the committed recipe runs
    # and the reference both trained f32.
    compute_dtype: str = "float32"
    # storage dtype for the device-resident dataset when it is NOT uint8-
    # packable (feature-space ContextFeat data): "bfloat16" halves both its
    # HBM footprint and the per-fused-call relay argument re-ship (the relay
    # re-ships args every program call, CLAUDE.md) — at the 500-demo
    # strike-inception budget the f32 feature tensor is 6.5 GB/call.
    # Batches decode back to f32 inside the jitted step. None keeps f32.
    device_data_dtype: str | None = None
    seed: int = 0
    data_axis: str = "data"  # mesh axis for data parallelism
    checkpoint_dir: str = "checkpoints"


@dataclass(frozen=True)
class EnvConfig(_Base):
    """Task-environment config.

    Replaces the ``env._kwargs`` side channel read by the reference envs'
    ``viewer_setup``/``reset_model``/``_step`` (e.g. pusher3dof.py:36-51).
    """

    name: str = "pusher3dof"
    image_size: tuple[int, int] = (48, 48)
    render_size: tuple[int, int] = (500, 500)  # offscreen render, pre-resize
    viewpoint: float | tuple[float, ...] | None = None  # camera azimuth(s)
    view_angle: float | tuple[float, ...] | None = None  # camera elevation(s)
    cam_dist: float | None = None
    n_viewpoints: int = 1  # nvp
    horizon: int = 50
    frame_skip: int = 5
    # deterministic context overrides (reference 'geoms'/'goal'/'object'/colors)
    goal: tuple[float, float] | None = None
    object_pos: tuple[float, float] | None = None
    geoms: tuple | None = None
    bgcolor: tuple[float, ...] | None = None
    armcolor: tuple[float, ...] | None = None
    render_frames: bool = True  # render odd-step frames into info
    # "fast" disables shadows/reflections/MSAA in the offscreen renderer —
    # on this image GL is software (llvmpipe, one core) where the shadow
    # pass alone is ~80 ms/frame vs ~2-6 ms without; measured identical
    # scene content (geoms/colors/camera) either way. "full" keeps MuJoCo
    # defaults (closest to the reference's GLFW viewer output).
    render_quality: str = "fast"  # fast | full
    # rollout/frames backend for the RL + demo legs:
    #   "auto"   — python task logic + native batched EGL rendering (the
    #              round-2 default; bit-parity with the python renderer)
    #   "tpu"    — fully-native vectorized stepping (sim/native_tasks.py)
    #              with the on-device raycast renderer (sim/raycast.py):
    #              frames are born on the accelerator, EnvExecTime drops
    #              ~10x at reference scale
    #   "native" — fully-native stepping with EGL frames
    #   "python" — per-env python stepping + rendering
    frame_backend: str = "auto"
    # emit the task's shaped distance reward instead of 0 — used to train
    # oracle experts for demo generation (the visual-imitation loop always
    # runs with 0 native reward, like the reference envs)
    dense_reward: bool = False
    # full-state observation variant (proprio + effector/object/goal COMs,
    # reference pusher3dof.py:121-134 tpil/inceptionsame branch) — the obs
    # the reference's shipped expert policies were trained on
    full_state: bool = False
    seed: int = 0


@dataclass(frozen=True)
class RewardConfig(_Base):
    """Visual reward engine config (reference rllab/sampler/base.py:49-257)."""

    mode: str = "ours"  # ours | oursinception | oracle | inception | inceptionsame | none
    ablation: str = "none"  # none | nofeat | noimage | recon
    scale: float = 1.0  # pixel-term weight
    model_checkpoint: str = ""  # trained translation model
    demo_data: str = ""  # held-out demo videos npy [T, N, H, W, C]
    n_demos: int = 0  # 0 = all videos in demo_data
    inception_layer: str = "Mixed_7c"
    mean_file: str = ""  # expert activation means (inception mode)
    backbone_npz: str = ""  # converted slim checkpoint for the backbone
    batch_frames: int = 25  # frames scored per path (odd steps of horizon 50)
    skip: int = 1  # demo temporal subsample (2 for sweep/real)


@dataclass(frozen=True)
class RLConfig(_Base):
    """TRPO / policy-optimization config (reference batch_polopt.py + npo.py)."""

    batch_size: int = 12_500  # env steps per iteration (250 paths x 50)
    max_path_length: int = 50
    n_iters: int = 200
    discount: float = 0.99
    gae_lambda: float = 1.0
    step_size: float = 0.01  # max mean-KL
    cg_iters: int = 10
    cg_damping: float = 1e-5  # reg_coeff
    backtrack_ratio: float = 0.8
    max_backtracks: int = 15
    center_adv: bool = True
    positive_adv: bool = False
    policy_hidden: tuple[int, ...] = (32, 32)
    init_std: float = 10.0
    min_std: float = 1e-6
    baseline: str = "linear"  # linear | zero
    n_envs: int = 100  # vectorized env copies
    seed: int = 123
    snapshot_mode: str = "last"  # all | last | gap | none
    snapshot_gap: int = 1
    # paper-facing SuccessRate threshold on per-rollout ReturnTrue
    # (notebooks/plots.ipynb cell 25: -0.5 default, -0.55 for sweep)
    success_threshold: float = -0.5
    # report/return the argmax-ReturnTrue iterate instead of the last one —
    # the reference's plots read across per-iteration snapshots
    # (rllab/misc/logger.py:216-228 + plots notebook)
    use_best_iterate: bool = True


@dataclass(frozen=True)
class ExperimentConfig(_Base):
    """One experiment = env + reward + rl + (optionally) model/train configs."""

    name: str = "exp"
    log_dir: str = "data/exp"
    env: EnvConfig = field(default_factory=EnvConfig)
    reward: RewardConfig = field(default_factory=RewardConfig)
    rl: RLConfig = field(default_factory=RLConfig)
    model: TranslationModelConfig = field(default_factory=TranslationModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())


# Canonical per-task presets, mirroring the reference launchers
# (sandbox/andrew/run_trpo_{push,reach,strike,sweep,real}.py image sizes and
# model choices; see BASELINE.md).
TASK_PRESETS: dict[str, dict[str, Any]] = {
    "reach": dict(env="reacher3dof", image_size=(48, 48), model="context_skip", skip=1),
    "push": dict(env="pusher3dof", image_size=(48, 48), model="context_skip", skip=1),
    "strike": dict(env="striker", image_size=(64, 64), model="context_skip", skip=1),
    "throw": dict(env="thrower", image_size=(64, 64), model="context_skip", skip=1),
    "sweep": dict(
        env="cleaner", image_size=(36, 64), model="context_small", skip=2,
        success_threshold=-0.55,
    ),
    "real": dict(env="pusher3dofreal", image_size=(36, 64), model="context_small", skip=2),
    "strike_inception": dict(
        env="striker", image_size=(299, 299), model="context_feat", skip=2
    ),
}


def preset(task: str) -> ExperimentConfig:
    p = TASK_PRESETS[task]
    # 128^2 offscreen render keeps >=2x supersampling for every <=64^2 task
    # while costing ~2 ms/frame on software GL (vs ~6 ms at the reference's
    # 500^2 viewer size); the 299^2 inception config keeps the large render.
    render_size = (128, 128) if max(p["image_size"]) <= 64 else (500, 500)
    return ExperimentConfig(
        name=task,
        env=EnvConfig(name=p["env"], image_size=p["image_size"], render_size=render_size),
        reward=RewardConfig(skip=p["skip"]),
        rl=RLConfig(success_threshold=p.get("success_threshold", -0.5)),
        model=TranslationModelConfig(model=p["model"], image_size=p["image_size"]),
    )
