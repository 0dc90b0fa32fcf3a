"""Tensor-parallel sharding rules for the context-translation models.

The reference has no intra-model parallelism at all (single-GPU TF1 training,
``scripts/train_script.py``); data parallelism already covers its training
sizes. This module exists for the scale the reference could NOT reach: the
feature-space :class:`~imitation_from_observation_tpu.models.context.ContextFeat`
variant (ContextAEInception2, arm_shaping.py:1786-1894) carries ~153 M params
— 2048-channel 3x3 convs over Inception Mixed_7c maps — where sharding the
CHANNEL dimension over a ``model`` mesh axis splits both the dominant matmuls
and the activation footprint across chips.

The design is the TPU-native recipe (scaling-book): annotate every parameter
leaf with a :class:`~jax.sharding.PartitionSpec` over a 2D ``(data, model)``
mesh and let GSPMD propagate activation shardings and insert the collectives.
Megatron-style pairing keeps collectives off the hot path where the topology
allows it:

- conv / deconv kernels: output-channel sharded (``[k,k,in,out]`` -> out;
  deconvs store HWOI, so their out axis is dim 2). Successive convs then
  chain column-parallel with the input channel dim re-sharded by GSPMD.
- dense pairs (encoder ``h4_lin -> hz_lin``, translator ``trans_h0 ->
  trans_z``): first layer column-parallel (out sharded), second
  row-parallel (in sharded) — one psum per pair, activations stay sharded
  in between (Megatron MLP pattern).
- biases follow their matmul: sharded with a column-parallel out dim,
  replicated after a row-parallel psum.

Everything else (batch stats, scalars) replicates. The specs are pure
metadata: the models themselves are unchanged, and a ``model``-axis size of 1
degenerates to the data-parallel layout.

On real multi-chip TPU slices the fused Pallas kernels (``ops/pallas``) do
not auto-partition under GSPMD — the trainer detects a tensor-parallel mesh
and sets ``IFO_TPU_PALLAS=0`` (their documented kill-switch) itself, so the
tp path uses the XLA fallbacks, which partition freely. Note this is
process-global: later non-tp trainers in the same process also fall back
(matching behavior, ~2% slower encoder — see docs/BENCHMARKS.md kernel
A/B). The CPU-mesh dryrun/test path needs nothing (``pallas_enabled()`` is
False off-TPU).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# second dense of each Megatron pair: row-parallel (in-dim sharded, psum'd
# output) — module names from models/context.py (ConvEncoder.hz_lin,
# Translator.trans_z)
_ROW_PARALLEL = ("hz_lin", "trans_z")


def make_mesh_2d(
    model: int,
    n_devices: int | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """A 2D ``(data, model)`` mesh over the first ``n_devices`` devices.

    ``model`` is the tensor-parallel degree; the data axis takes the rest.
    Lay the model axis minor (fastest-varying over adjacent devices) so its
    per-layer collectives ride the shortest ICI hops on a real slice.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    if len(devices) % model != 0:
        raise ValueError(f"{len(devices)} devices not divisible by model={model}")
    grid = np.asarray(devices).reshape(len(devices) // model, model)
    return Mesh(grid, (data_axis, model_axis))


def model_axis_size(mesh: Mesh, model_axis: str = "model") -> int:
    """Tensor-parallel degree of ``mesh`` (1 when it has no model axis)."""
    return dict(mesh.shape).get(model_axis, 1)


def data_axis_size(mesh: Mesh, data_axis: str = "data") -> int:
    """Data-parallel degree of ``mesh`` (total size when unnamed)."""
    return dict(mesh.shape).get(data_axis, mesh.devices.size)


def context_param_specs(params, model_axis: str = "model", mesh: Mesh | None = None):
    """PartitionSpec tree for a context-model param tree (see module doc).

    Works for every ``_ContextBase`` variant (ContextSkip/Small/Feat and the
    zoo variants built from the same Conv/Deconv/Dense blocks): the rules key
    on module name + kernel rank, not on a hardcoded tree shape, and decide
    each ``{w, b}`` pair jointly so a bias always matches its matmul (sharded
    with a column-parallel out dim, replicated after a row-parallel psum).

    With ``mesh``, dimensions the model axis does not divide fall back:
    column-parallel -> row-parallel (e.g. the decoder's final deconv, whose
    out dim is the 3-channel image) -> replicated. Without ``mesh`` the specs
    are pure topology (no divisibility check).
    """
    msize = dict(mesh.shape).get(model_axis) if mesh is not None else None

    def divides(n: int) -> bool:
        return msize is None or n % msize == 0

    def pair(name: str, w) -> tuple[P, P]:
        if w.ndim == 4:  # conv [k,k,in,out]; deconv HWOI [k,k,out,in]
            out_dim, in_dim = (2, 3) if name.startswith("d_") else (3, 2)
            if divides(w.shape[out_dim]):
                s = [None] * 4
                s[out_dim] = model_axis
                return P(*s), P(model_axis)
            if divides(w.shape[in_dim]):
                s = [None] * 4
                s[in_dim] = model_axis
                return P(*s), P()
            return P(), P()
        if w.ndim == 2:  # dense [in, out]
            if name in _ROW_PARALLEL and divides(w.shape[0]):
                return P(model_axis, None), P()
            if divides(w.shape[1]):
                return P(None, model_axis), P(model_axis)
            if divides(w.shape[0]):
                return P(model_axis, None), P()
            return P(), P()
        return P(), P()

    def walk(node, name: str = ""):
        if hasattr(node, "items"):  # dict / FrozenDict
            keys = set(node.keys())
            if "w" in keys and keys <= {"w", "b"}:
                ws, bs = pair(name, node["w"])
                return type(node)({k: (ws if k == "w" else bs) for k in node})
            return type(node)({k: walk(v, str(k)) for k, v in node.items()})
        return P()  # non-paired leaves (BN stats, scalars) replicate

    return walk(params)


def shard_params(mesh: Mesh, params, model_axis: str = "model"):
    """Device-put ``params`` with tensor-parallel leaf shardings on ``mesh``."""
    specs = context_param_specs(params, model_axis, mesh=mesh)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
    if len(leaves) != len(spec_leaves):  # pragma: no cover - structural bug guard
        raise ValueError(
            f"spec tree has {len(spec_leaves)} leaves for {len(leaves)} params"
        )
    return treedef.unflatten(
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(leaves, spec_leaves)
    )
