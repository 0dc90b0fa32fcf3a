"""Tensor-parallel (2D data x model mesh) trainer path on the CPU mesh.

The reference has no intra-model parallelism (single-GPU TF1,
scripts/train_script.py); these tests validate the beyond-reference
Megatron-style channel sharding of parallel/tp.py: spec coverage, genuine
leaf sharding on the mesh, and bit-level-tolerance equivalence of the full
fused training step against the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree
from jax.sharding import PartitionSpec as P

from imitation_from_observation_tpu.core.config import TrainConfig, TranslationModelConfig
from imitation_from_observation_tpu.models import build_model
from imitation_from_observation_tpu.parallel import (
    context_param_specs,
    make_mesh,
    make_mesh_2d,
    model_axis_size,
    shard_params,
)
from imitation_from_observation_tpu.train import TranslationTrainer

from tests.test_trainer import _synthetic_vdata


def _tiny_skip_cfg():
    return TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32
    )


def _init_params(model_cfg, sample_shape):
    model = build_model(model_cfg)
    x = jnp.zeros(sample_shape, jnp.float32)
    return model, model.init(jax.random.key(0), x, x, x)


def test_mesh_2d_axes():
    mesh = make_mesh_2d(model=4, n_devices=8)
    assert mesh.axis_names == ("data", "model")
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    assert model_axis_size(mesh) == 4
    assert model_axis_size(make_mesh(8)) == 1


def test_param_specs_cover_every_leaf():
    _, params = _init_params(_tiny_skip_cfg(), (1, 16, 16, 3))
    specs = context_param_specs(params)
    leaves, spec_leaves = jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    assert len(leaves) == len(spec_leaves)
    flat = jax.tree_util.tree_flatten_with_path(specs, is_leaf=lambda x: isinstance(x, P))[0]
    by_name = {"/".join(str(getattr(k, "key", k)) for k in path): s for path, s in flat}
    # conv kernels: output-channel (last dim) sharded
    assert by_name["params/conv/h0_conv/w"] == P(None, None, None, "model")
    # deconv kernels are HWOI: out at dim 2
    assert by_name["params/deconv/d_h1/w"] == P(None, None, "model", None)
    # Megatron pair: first dense column-parallel, second row-parallel with
    # replicated bias
    assert by_name["params/conv/h4_lin/w"] == P(None, "model")
    assert by_name["params/conv/hz_lin/w"] == P("model", None)
    assert by_name["params/conv/hz_lin/b"] == P()
    assert by_name["params/conv/h4_lin/b"] == P("model")
    assert by_name["params/translate/trans_z/w"] == P("model", None)


def test_shard_params_places_shards():
    mesh = make_mesh_2d(model=4, n_devices=8)
    _, params = _init_params(_tiny_skip_cfg(), (1, 16, 16, 3))
    sharded = shard_params(mesh, params)
    w = sharded["params"]["conv"]["h0_conv"]["w"]  # [5,5,3,8] out-sharded
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(5, 5, 3, 2)}  # 8 out-channels / model=4
    b = sharded["params"]["conv"]["hz_lin"]["b"]  # replicated
    assert {s.data.shape for s in b.addressable_shards} == {(32,)}


def _train(mesh, vdata, model_cfg, n_iters=4):
    cfg = TrainConfig(
        batch_size=8, n_train=vdata.shape[1], n_iters=n_iters, steps_per_call=2,
        eval_every=10_000, save_every=10_000, log_every=10_000,
        learning_rate=1e-3, seed=0, on_device_data=True,
    )
    tr = TranslationTrainer(model_cfg, cfg, vdata, mesh=mesh)
    state = tr.train()
    return np.asarray(ravel_pytree(jax.device_get(state.params))[0])


def test_tp_trainer_matches_single_device():
    """2x4 (data x model) fused training == 1-device training.

    Same seeds -> identical batch indices (fold_in on step); the only
    difference is GSPMD's partial-sum ordering, so results agree to float
    tolerance.
    """
    vdata = _synthetic_vdata(T=4, N=6)
    flat1 = _train(make_mesh(1), vdata, _tiny_skip_cfg())
    flatn = _train(make_mesh_2d(model=4, n_devices=8), vdata, _tiny_skip_cfg())
    np.testing.assert_allclose(flat1, flatn, rtol=2e-4, atol=2e-5)


def test_tp_contextfeat_step():
    """ContextFeat (the tp target: feature-space model) trains on the 2D
    mesh with channel counts divisible by the model axis."""
    rng = np.random.default_rng(0)
    vdata = rng.uniform(-1, 1, (4, 6, 8, 8, 16)).astype(np.float32)
    model_cfg = TranslationModelConfig(
        model="context_feat", feat_size=32, filters=(16, 16, 8, 8),
        strides=(1, 2, 1, 2), kernels=(3, 3, 3, 3),
        feature_hw=(8, 8), feature_channels=16,
    )
    flat1 = _train(make_mesh(1), vdata, model_cfg, n_iters=2)
    flatn = _train(make_mesh_2d(model=4, n_devices=8), vdata, model_cfg, n_iters=2)
    assert np.all(np.isfinite(flatn))
    np.testing.assert_allclose(flat1, flatn, rtol=2e-4, atol=2e-5)


def test_tp_indivisible_channels_fall_back():
    """Dims the model axis doesn't divide fall back (column -> row ->
    replicated) instead of producing invalid placements: placement succeeds
    and every leaf's shards tile its global shape exactly."""
    mesh = make_mesh_2d(model=4, n_devices=8)
    model_cfg = TranslationModelConfig(
        model="context_feat", feat_size=32, filters=(6, 6, 6, 6),
        strides=(1, 2, 1, 2), kernels=(3, 3, 3, 3),
        feature_hw=(8, 8), feature_channels=16,
    )
    _, params = _init_params(model_cfg, (1, 8, 8, 16))
    sharded = jax.block_until_ready(shard_params(mesh, params))
    for leaf in jax.tree_util.tree_leaves(sharded):
        for s in leaf.addressable_shards:
            # every shard dim divides the global dim (no ragged shards)
            assert all(
                g % l == 0 for g, l in zip(leaf.shape, s.data.shape)
            ), (leaf.shape, s.data.shape)
    # the skip model's FINAL deconv (3 image channels: HWOI out dim 2 is
    # indivisible) falls back to input-channel (row-parallel) sharding with
    # a replicated bias
    _, skip_params = _init_params(_tiny_skip_cfg(), (1, 16, 16, 3))
    specs = context_param_specs(skip_params, mesh=mesh)
    deconvs = skip_params["params"]["deconv"]
    final = next(n for n, m in deconvs.items() if getattr(m.get("w"), "ndim", 0) == 4 and m["w"].shape[2] == 3)
    assert specs["params"]["deconv"][final]["w"] == P(None, None, None, "model")
    assert specs["params"]["deconv"][final]["b"] == P()
