"""GPipe-style pipeline parallelism for the Inception-v3 backbone.

The reference runs its Inception featurization as one single-GPU TF1
``sess.run`` per video (rllab/sampler/base.py:77-137). Here the backbone is
the framework's one genuinely DEEP sequential network (~20 ConvBN layers on
the Mixed_7c path at 299x299), so the TPU-native scale-out for it is
pipeline parallelism: the trunk splits into S contiguous segments at
endpoint boundaries (``InceptionV3`` executes segments natively via
``start_after`` / ``final_endpoint``), each mesh ``pipe`` stage holds ONLY
its segment's parameters, and microbatches stream through the stages with
one ``ppermute`` hop per tick — the classic GPipe schedule expressed as a
``lax.scan`` over ``n_micro + S - 1`` ticks inside one ``shard_map``.

Why this shape:

- Stage params are stacked into a single ``[S, L]`` buffer (each segment's
  tree raveled and zero-padded to the longest) sharded over ``pipe`` —
  per-device parameter memory is ~1/S of the backbone, which is the point
  of pp. Padding lanes are inert: no branch reads them, so their gradients
  are zero, and an elementwise optimizer can treat the buffer as one array.
- Heterogeneous segments under SPMD: every device runs the same program, so
  the per-stage computation is a ``lax.switch`` on ``axis_index("pipe")``
  over segment closures; activations travel as flat ``[micro_B, A]``
  buffers padded to the largest inter-stage activation, and each branch
  statically reshapes its own slice.
- The whole schedule is differentiable (``ppermute`` transposes to the
  reverse permute; ``switch``/``scan``/``psum`` are standard), so
  ``jax.grad`` through :meth:`InceptionPipeline.apply` yields pipeline-
  parallel BACKWARD too — per-stage parameter gradients land back in the
  stacked buffer.

Stages idle during the S-1 bubble ticks (clamped-index dummy compute);
efficiency is n/(n+S-1) — callers pick ``micro_batch``/microbatch count
accordingly. The translation nets themselves deliberately do NOT pipeline:
they are 5-7 layers of MXU-starved convs where pp would only add bubble
and ICI latency (docs/BENCHMARKS.md, multi-chip stance).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_BOUNDARIES = ("MaxPool_5a_3x3", "Mixed_6a", "Mixed_6e")


def make_mesh_pipe(stages: int, data: int = 1) -> Mesh:
    """A ``(pipe,)`` mesh over the first ``stages`` devices — or, with
    ``data > 1``, a 2D ``(data, pipe)`` mesh of ``data`` independent
    pipelines (pipe laid minor so stage hops ride adjacent-device ICI)."""
    devices = jax.devices()
    n = stages * data
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if data == 1:
        return Mesh(np.asarray(devices[:n]), ("pipe",))
    return Mesh(np.asarray(devices[:n]).reshape(data, stages), ("data", "pipe"))


class InceptionPipeline:
    """Pipeline-parallel executor for ``InceptionV3.features``.

    Args:
      model: the flax InceptionV3 (or any module exposing the same
        ``start_after``/``final_endpoint`` segment contract).
      params: FULL parameter tree (as from ``model.init`` or the slim
        converter). Trunk segments' subtrees are extracted per stage; head
        params (``Logits/...``) are ignored — the pipeline is features-only.
      input_hw: static input spatial size (the pipeline compiles one
        program per (n_micro, micro_batch) shape).
      boundaries: endpoint names where the trunk is cut; stage i runs
        ``(boundaries[i-1], boundaries[i]]``. len(boundaries)+1 == S.
      mesh: a ``(pipe,)`` mesh of exactly S devices (default: build one).
      micro_batch: frames per microbatch (the unit that flows through the
        pipe).
    """

    def __init__(
        self,
        model,
        params: Any,
        input_hw: tuple[int, int],
        boundaries: Sequence[str] = DEFAULT_BOUNDARIES,
        final_endpoint: str = "Mixed_7c",
        mesh: Mesh | None = None,
        micro_batch: int = 8,
        compute_dtype=jnp.float32,
    ):
        boundaries = tuple(boundaries)
        self.S = len(boundaries) + 1
        self.mesh = mesh if mesh is not None else make_mesh_pipe(self.S)
        psize = dict(self.mesh.shape).get("pipe")
        if psize != self.S:
            raise ValueError(f"mesh pipe axis {psize} != {self.S} stages")
        # a 2D (data, pipe) mesh runs `data` independent pipelines, each over
        # its shard of the microbatches (dp x pp — the production
        # featurization shape). Differentiating apply() is supported on the
        # 1D mesh (training pp); on 2D the stage buffer is replicated over
        # `data` and check_vma=False skips the transpose psum.
        self._dsize = dict(self.mesh.shape).get("data", 1)
        self.mB = micro_batch
        self.dtype = jnp.dtype(compute_dtype)
        starts = (None,) + boundaries
        ends = boundaries + (final_endpoint,)
        self._segs = list(zip(starts, ends))

        # -- per-stage static shapes via an eval_shape chain ----------------
        h = jax.ShapeDtypeStruct((micro_batch, *input_hw, 3), self.dtype)
        seg_models, in_shapes = [], []
        for start, end in self._segs:
            seg_model = model.clone(final_endpoint=end)
            seg_models.append(seg_model)
            in_shapes.append(h.shape)
            like = jax.eval_shape(
                lambda hh, m=seg_model, s=start: m.init(
                    jax.random.key(0), hh, features_only=True, start_after=s
                ),
                h,
            )
            h = jax.ShapeDtypeStruct(
                jax.eval_shape(
                    lambda p, hh, m=seg_model, s=start, e=end: m.apply(
                        p, hh, features_only=True, start_after=s
                    )[e],
                    like,
                    h,
                ).shape,
                self.dtype,
            )
        self.out_shape = h.shape[1:]  # per-micro [h, w, c] of the final endpoint
        self._seg_models = seg_models
        self._in_shapes = in_shapes

        # -- split the real param tree into per-stage subtrees --------------
        # segment init (above) showed each segment's params are exactly the
        # top-level scopes named after its endpoints; select those keys.
        tree = params["params"] if "params" in params else params
        own = []
        claimed: set[str] = set()
        for start, end in self._segs:
            names = self._segment_scope_names(start, end)
            sub = {k: tree[k] for k in tree if k.split("/")[0] in names}
            if not sub:
                raise ValueError(f"segment ({start}->{end}] claimed no params")
            dup = claimed & set(sub)
            if dup:  # pragma: no cover - topology bug guard
                raise ValueError(f"segments overlap on {sorted(dup)[:3]}")
            claimed |= set(sub)
            own.append({"params": sub})

        flats, self._unflats = [], []
        for sub in own:
            flat, unflat = ravel_pytree(
                jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), sub)
            )
            flats.append(flat)
            self._unflats.append(unflat)
        self._L = [int(f.size) for f in flats]
        L = max(self._L)
        stacked = jnp.stack([jnp.pad(f, (0, L - f.size)) for f in flats])  # [S, L]
        self.param_buf = jax.device_put(stacked, NamedSharding(self.mesh, P("pipe")))

        # -- activation buffer: the largest inter-stage payload -------------
        self._a_in = [int(math.prod(s[1:])) for s in self._in_shapes]
        self._a_out = int(math.prod(self.out_shape))
        self._A = max(self._a_in + [self._a_out])
        self._run_cache: dict[int, Any] = {}

    def _segment_scope_names(self, start, end) -> set[str]:
        ops = [name for name, _ in self._seg_models[0]._trunk_ops()]
        i0 = 0 if start is None else ops.index(start) + 1
        return set(ops[i0 : ops.index(end) + 1])

    # -- the pipelined program ----------------------------------------------
    def _build(self, n_micro: int):
        S, mB, A = self.S, self.mB, self._A
        dtype = self.dtype

        def make_branch(i):
            seg_model, (start, end) = self._seg_models[i], self._segs[i]
            unflat, L_i, a_in = self._unflats[i], self._L[i], self._a_in[i]
            in_shape = self._in_shapes[i]

            def branch(pbuf_l, act):
                p = unflat(pbuf_l[0, :L_i])
                x = act[:, :a_in].reshape(mB, *in_shape[1:])
                ep = seg_model.apply(p, x, features_only=True, start_after=start)
                y = ep[end].astype(dtype).reshape(mB, -1)
                return jnp.pad(y, ((0, 0), (0, A - y.shape[1])))

            return branch

        def inner(pbuf_l, xm):  # pbuf_l [1, L]; xm [n_micro, mB, h, w, 3]
            stage = jax.lax.axis_index("pipe")
            branches = [make_branch(i) for i in range(S)]

            def tick(recv, t):
                # stage 0 injects microbatch t (clamped in the drain bubble);
                # everyone else consumes what the left neighbour sent
                idx = jnp.minimum(t, n_micro - 1)
                x0 = jax.lax.dynamic_index_in_dim(xm, idx, keepdims=False)
                x0 = jnp.pad(x0.reshape(mB, -1), ((0, 0), (0, A - self._a_in[0])))
                act = jnp.where(stage == 0, x0.astype(dtype), recv)
                y = jax.lax.switch(stage, [partial(b, pbuf_l) for b in branches], act)
                send = jax.lax.ppermute(y, "pipe", [(i, i + 1) for i in range(S - 1)])
                return send, y

            _, ys = jax.lax.scan(tick, jnp.zeros((mB, A), dtype), jnp.arange(n_micro + S - 1))
            outs = ys[S - 1 :]  # last stage's valid outputs, ticks S-1 .. S-2+n_micro
            outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
            outs = jax.lax.psum(outs, "pipe")  # broadcast the result off stage S-1
            return outs[..., : self._a_out].reshape(n_micro, mB, *self.out_shape)

        # 2D mesh: microbatches shard over `data`, each row pipelines its own
        data_spec = P("data") if self._dsize > 1 else P()
        return jax.jit(
            shard_map(
                inner, mesh=self.mesh, in_specs=(P("pipe"), data_spec),
                out_specs=data_spec, check_vma=False,
            )
        )

    def apply(self, param_buf, x_micros):
        """Pipelined forward: ``[n_micro, mB, h, w, 3]`` ->
        ``[n_micro, mB, *out_shape]``. ``param_buf`` is the stacked ``[S, L]``
        stage buffer (``self.param_buf`` or an optimizer-updated copy).
        Differentiable on a 1D pipe mesh; on a 2D ``(data, pipe)`` mesh
        ``n_micro`` must divide the data axis and the path is forward-only
        (see ``__init__`` note)."""
        n_micro = int(x_micros.shape[0])
        if n_micro % self._dsize:
            raise ValueError(f"n_micro={n_micro} not divisible by data={self._dsize}")
        n_local = n_micro // self._dsize
        if n_local not in self._run_cache:
            self._run_cache[n_local] = self._build(n_local)
        return self._run_cache[n_local](param_buf, x_micros)

    def features(self, frames) -> np.ndarray:
        """[N, h, w, 3] float in [-1, 1] -> [N, *out_shape] (host convenience:
        pads N up to a whole number of microbatches per data row)."""
        frames = np.asarray(frames, np.float32)
        N = frames.shape[0]
        n_micro = -(-N // self.mB)  # ceil: whole microbatches
        n_micro = -(-n_micro // self._dsize) * self._dsize  # per data row
        pad = n_micro * self.mB - N
        if pad:
            frames = np.concatenate([frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)])
        out = self.apply(self.param_buf, frames.reshape(n_micro, self.mB, *frames.shape[1:]))
        return np.asarray(out).reshape(n_micro * self.mB, *self.out_shape)[:N]
