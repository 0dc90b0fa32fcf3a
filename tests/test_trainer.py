"""Trainer integration test on the 8-device CPU mesh with synthetic demos."""

import os

import numpy as np

from imitation_from_observation_tpu.core.config import TrainConfig, TranslationModelConfig
from imitation_from_observation_tpu.train import TranslationTrainer


def _synthetic_vdata(T=8, N=12, hw=16, seed=0):
    """Moving-dot videos: context = background color, motion = shared across
    contexts, so translation is actually learnable."""
    rng = np.random.default_rng(seed)
    vdata = np.zeros((T, N, hw, hw, 3), np.float32)
    for n in range(N):
        bg = rng.uniform(-0.8, 0.8, 3)
        vdata[:, n] = bg
        for t in range(T):
            x = int((t / T) * (hw - 4))
            vdata[t, n, 6:10, x : x + 4] = 1.0
    return vdata


def test_trainer_end_to_end(tmp_path):
    vdata = _synthetic_vdata()
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    cfg = TrainConfig(
        batch_size=16,
        n_train=9,
        n_iters=60,
        eval_every=20,
        save_every=60,
        log_every=20,
        learning_rate=1e-3,
        seed=0,
    )
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    assert tr.batch_size % tr.mesh.devices.size == 0

    src, ctx, tgt = tr._device_batch(tr.valid_sampler.sample())
    m0, _ = tr._eval_step(tr.state.params, src, ctx, tgt)
    tr.train()
    m1, _ = tr._eval_step(tr.state.params, src, ctx, tgt)
    assert float(m1["loss"]) < float(m0["loss"])

    # checkpoint + gifs + validloss written at save_every
    ckdir = tmp_path / "checkpoints" / "60"
    assert ckdir.exists()
    names = os.listdir(ckdir)
    assert any(n.startswith("model_60_") and n.endswith(".npz") for n in names)
    assert "validloss.npy" in names
    assert sum(n.endswith("trans.gif") for n in names) == 10
    # progress.csv has the reference's tabular schema
    header = (tmp_path / "progress.csv").read_text().splitlines()[0]
    for col in ["Iteration", "Loss", "Sim", "R1", "R2", "NNErr"]:
        assert col in header


def test_trainer_dropout_model(tmp_path):
    """context_small trains (dropout rng threading works under jit)."""
    vdata = _synthetic_vdata(T=4, N=6, hw=16)
    model_cfg = TranslationModelConfig(model="context_small", image_size=(16, 16), feat_size=100)
    cfg = TrainConfig(batch_size=8, n_train=4, n_iters=4, eval_every=4, save_every=100, log_every=100)
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    tr.train()
    assert int(tr.state.step) == 4


def test_trainer_host_batching_path(tmp_path):
    """The legacy host-side batch path (on_device_data=False) still works."""
    vdata = _synthetic_vdata(T=4, N=6, hw=16)
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    cfg = TrainConfig(batch_size=8, n_train=4, n_iters=6, eval_every=6, save_every=100,
                      log_every=100, on_device_data=False, learning_rate=1e-3)
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    tr.train()
    assert int(tr.state.step) == 6


def test_trainer_fused_steps(tmp_path):
    """steps_per_call fuses K optimizer steps into one scan'd device call."""
    vdata = _synthetic_vdata(T=4, N=6, hw=16)
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    cfg = TrainConfig(batch_size=8, n_train=4, n_iters=9, steps_per_call=3,
                      eval_every=9, save_every=1000, log_every=3, learning_rate=1e-3)
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    tr.train()
    assert int(tr.state.step) == 9


def test_trainer_cadence_rounds_to_fused_calls(tmp_path, monkeypatch):
    """With K-fused calls, log/eval/save fire whenever the K-window CROSSES a
    multiple of the cadence (not only when itr lands exactly on one), and the
    total step count rounds UP so n_iters is never silently under-trained."""
    vdata = _synthetic_vdata(T=4, N=6, hw=16)
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    # K=5, eval_every=4: the old `itr % 4 == 0` fired only at itr 20 (lcm);
    # crossing fires at every call. n_iters=12 rounds up to 15 (3 calls).
    cfg = TrainConfig(batch_size=8, n_train=4, n_iters=12, steps_per_call=5,
                      eval_every=4, save_every=1000, log_every=1000,
                      learning_rate=1e-3)
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    evals = []
    monkeypatch.setattr(
        tr, "_evaluate_and_maybe_save",
        lambda itr, t0, save=None: evals.append((itr, save)),
    )
    tr.train()
    assert int(tr.state.step) == 15  # rounded up, not 10 (and not 0)
    assert [e[0] for e in evals] == [5, 10, 15]  # crossings of every=4
    assert all(e[1] is False for e in evals)  # save_every=1000 never crossed


def test_trainer_bf16_compute_matches_f32_trend(tmp_path):
    """Mixed-precision training (compute_dtype='bfloat16': bf16 conv trunks,
    f32 master params/Adam/loss) must track the f32 loss trajectory — the
    quality gate for running translation training on the MXU-native dtype."""
    vdata = _synthetic_vdata()
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    finals = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(
            batch_size=16, n_train=9, n_iters=60, eval_every=10**9,
            save_every=10**9, log_every=10**9, learning_rate=1e-3, seed=0,
            compute_dtype=dt, on_device_data=False,
        )
        tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path / dt))
        tr.train()
        import jax
        import jax.numpy as jnp

        src = jnp.asarray(vdata[:, 9])
        ctx = jnp.asarray(np.broadcast_to(vdata[0, 9], src.shape))
        metrics, _ = tr._eval_step(tr.state.params, src, ctx, src)
        finals[dt] = float(metrics["loss"] if "loss" in metrics else sum(
            v for k, v in metrics.items() if k in ("recon1", "recon2", "simloss")
        ))
    assert np.isfinite(finals["bfloat16"])
    # bf16 final loss within 1.5x of f32 (and both finite): same function
    # class, quantization noise only
    assert finals["bfloat16"] <= 1.5 * finals["float32"] + 1e-3, finals


def test_trainer_grad_clip_bounds_update(tmp_path):
    """grad_clip_norm caps the global gradient norm entering Adam: training
    on inputs scaled 1000x (heavy-tailed, like random-backbone features)
    must stay finite and produce bounded per-step parameter movement."""
    vdata = _synthetic_vdata() * 1000.0
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    cfg = TrainConfig(
        batch_size=16, n_train=9, n_iters=10, eval_every=10**9,
        save_every=10**9, log_every=10**9, learning_rate=1e-3, seed=0,
        grad_clip_norm=1.0, on_device_data=False,
    )
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path))
    import jax

    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.train()
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    deltas = jax.tree_util.tree_map(lambda a, b: np.abs(b - a).max(), p0, p1)
    max_delta = max(jax.tree_util.tree_leaves(deltas))
    assert np.isfinite(max_delta)
    # Adam's per-step update is bounded by lr; 10 steps at lr 1e-3
    assert max_delta <= 10 * 1e-3 * 1.5


def test_trainer_uint8_device_data_path(tmp_path):
    """u8-exact demo data is stored on device as uint8 (4x HBM cut — the
    fix for the 4k-video push OOM) and decoded in-step; training must match
    the f32 device path step-for-step (decode is <=1 ulp from the host f32)."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.train.trainer import _pack_device_data

    # quantize the synthetic videos to the ingest's exact u8 grid
    vdata = _synthetic_vdata(T=4, N=6, hw=16)
    u8 = np.rint((vdata + 1.0) * 127.5).astype(np.uint8)
    vdata = (u8.astype(np.float32) / np.float32(127.5) - np.float32(1.0))

    packed, is_u8 = _pack_device_data(vdata)
    assert is_u8 and packed.dtype == np.uint8
    np.testing.assert_array_equal(packed, u8)
    # non-grid data falls back untouched
    raw = _synthetic_vdata(T=4, N=6, hw=16)
    unpacked, flag = _pack_device_data(raw)
    assert not flag and unpacked is raw

    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )
    cfg = TrainConfig(batch_size=8, n_train=4, n_iters=6, steps_per_call=3,
                      eval_every=1000, save_every=1000, log_every=1000,
                      learning_rate=1e-3, seed=0)
    tr = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path / "u8"))
    assert tr._dev_data_u8 and tr._train_data_dev.dtype == jnp.uint8
    tr.train()
    assert int(tr.state.step) == 6

    # force the f32 device path on the identical data: same final params
    tr32 = TranslationTrainer(model_cfg, cfg, vdata, log_dir=str(tmp_path / "f32"))
    tr32._dev_data_u8 = False
    tr32._train_data_dev = None  # rebuild below with the raw f32 data
    import jax

    from imitation_from_observation_tpu.parallel import replicated

    tr32._train_data_dev = jax.device_put(
        jnp.asarray(tr32.train_data), replicated(tr32.mesh)
    )
    tr32._train_step_dev = tr32._build_train_step_dev()
    tr32.train()
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(tr32.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_device_data_bf16_storage_close_to_f32():
    """Compact (bf16) device-data storage for non-u8 datasets (feature-space
    ContextFeat): runs the fused path and stays close to the f32-stored run
    (same seeds; only the dataset storage is quantized)."""
    import numpy as np

    from imitation_from_observation_tpu.core.config import (
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.train import TranslationTrainer

    rng = np.random.default_rng(0)
    # NOT u8-exact (uniform floats): triggers the f32 fallback, then the cast
    vdata = rng.uniform(-1, 1, (4, 6, 8, 8, 16)).astype(np.float32)
    m = TranslationModelConfig(
        model="context_feat", strides=(1, 2), kernels=(3, 3), filters=(8, 8),
        feat_size=8, feature_hw=(8, 8), feature_channels=16,
    )
    mk = lambda dd: TranslationTrainer(
        m,
        TrainConfig(batch_size=4, n_iters=6, n_train=5, steps_per_call=3,
                    eval_every=10**9, save_every=10**9, log_every=10**9,
                    device_data_dtype=dd),
        vdata,
    )
    ta, tb = mk(None), mk("bfloat16")
    assert not ta._dev_data_cast and tb._dev_data_cast
    assert tb._train_data_dev.dtype == "bfloat16"
    sa = ta.train(6)
    sb = tb.train(6)
    import jax

    la = jax.tree_util.tree_leaves(sa.params)[0]
    lb = jax.tree_util.tree_leaves(sb.params)[0]
    assert np.all(np.isfinite(np.asarray(la))) and np.all(np.isfinite(np.asarray(lb)))
    # same init, near-identical data -> parameters stay close after 6 steps
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=0.15, atol=1e-3)
