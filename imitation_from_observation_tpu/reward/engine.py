"""Visual reward engine — the paper's core mechanism.

Capability match for reference ``rllab/sampler/base.py:49-257``:

- mode ``oracle``: add the env's ground-truth ``reward_true`` to rewards
  (base.py:190-191).
- mode ``ours``/``oursinception``: on the first scored batch, translate every
  held-out demo video into the agent's context (frame 0 of the rollout) and
  cache, per viewpoint, the mean translated latent ``means[vp]`` [T, F] and
  mean translated image ``imgs[vp]`` [T, H, W, C] (base.py:195-226). Per
  rollout: encode the agent's T rendered frames, and splice
  ``rewards[2j+1] -= cost_j * j^2`` where ``cost_j`` sums over viewpoints the
  latent L2 to ``means`` plus ``scale`` times the pixel L2 to ``imgs``
  (base.py:227-257).
- ablations ``nofeat`` / ``noimage`` / ``recon`` (base.py:243-252). The
  reference's ``nofeat`` branch indexes the whole viewpoint list (a latent
  bug); here every ablation is consistently per-viewpoint (SURVEY §7
  normalization).

TPU-first re-architecture: the reference runs one ``sess.run`` per demo video
during warmup and one per rollout during scoring. Here the warmup translates
demos in fixed-size batched chunks under one jit, and scoring batches ALL
rollouts of an iteration into a single jitted call (frames ship as uint8,
normalize fuses into the encoder).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.core.config import RewardConfig, TranslationModelConfig
from imitation_from_observation_tpu.core.checkpoint import load_pytree
from imitation_from_observation_tpu.models import build_model


class VisualRewardEngine:
    def __init__(
        self,
        cfg: RewardConfig,
        model_cfg: TranslationModelConfig | None = None,
        params: Any = None,
        demo_data: np.ndarray | None = None,
        n_viewpoints: int = 1,
        feature_fn: Callable | None = None,
        chunk_videos: int = 16,
        mesh=None,
        inference_dtype: str = "auto",
    ):
        """``demo_data``: held-out demos [T, N, H, W, C] in [-1, 1] (the
        trainer's vdata format / reference ``modeldata`` npy). ``feature_fn``
        maps uint8 frames -> backbone feature maps for the inception modes.

        ``inference_dtype``: MXU compute dtype for the frozen-params scoring
        path. "auto" = bfloat16 on TPU (native MXU dtype: bf16 params halve
        weight HBM traffic and avoid the multi-pass f32 matmul decomposition;
        kill switch IFO_TPU_BF16_PARAMS=0), float32 elsewhere. All cost
        reductions (latent/pixel L2, means) stay float32 regardless."""
        self.cfg = cfg
        self.nvp = n_viewpoints
        self.chunk_videos = chunk_videos
        if inference_dtype == "auto":
            use_bf16 = os.environ.get("IFO_TPU_BF16_PARAMS", "1") != "0" and (
                jax.default_backend() not in ("cpu", "gpu")
            )
            self.inference_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        else:
            self.inference_dtype = jnp.dtype(inference_dtype)
        # optional multi-chip serving: rollouts shard over the mesh's data
        # axis for scoring (params replicated); None = single device
        self.mesh = mesh
        self.means: list[np.ndarray] | None = None
        self.imgs: list[np.ndarray] | None = None
        self.feature_fn = feature_fn
        if cfg.mode in ("ours", "oursinception"):
            if model_cfg is None:
                raise ValueError(f"mode {cfg.mode!r} needs a translation model config")
            self.model = build_model(model_cfg)
            if params is None:
                if not cfg.model_checkpoint:
                    raise ValueError("need params or cfg.model_checkpoint")
                params = self._load_params(cfg.model_checkpoint, model_cfg)
            self.params = params
            if demo_data is None and cfg.demo_data:
                demo_data = np.load(cfg.demo_data)
            if demo_data is None:
                raise ValueError(f"mode {cfg.mode!r} needs demo_data")
            # temporal subsample to the scored frame count (base.py:205-210);
            # ours stores [-1,1] floats, oursinception raw uint8 frames
            # (base.py:211-215 feeds them through the backbone first)
            dtype = np.uint8 if cfg.mode == "oursinception" else np.float32
            self.demo_data = np.asarray(demo_data[:: cfg.skip], dtype)
            if cfg.mode == "oursinception" and feature_fn is None:
                raise ValueError("mode 'oursinception' needs a feature_fn (backbone)")
            if cfg.n_demos:
                self.demo_data = self.demo_data[:, : cfg.n_demos]
            self._build_jits()
        elif cfg.mode in ("inception", "inceptionsame"):
            if feature_fn is None:
                raise ValueError(f"mode {cfg.mode!r} needs a feature_fn (backbone)")
            self.feat_means = None
            self.feat_std = None
        elif cfg.mode not in ("oracle", "none"):
            raise ValueError(f"unknown reward mode {cfg.mode!r}")

    def _load_params(self, path: str, model_cfg: TranslationModelConfig):
        sample = jnp.zeros((1, *model_cfg.image_size, model_cfg.channels), jnp.float32)
        like = self.model.init(jax.random.key(0), sample, sample, sample)
        return load_pytree(path, like)

    # -- jitted pipelines --------------------------------------------------
    def _build_jits(self) -> None:
        model = self.model
        # the engine's params are FROZEN after construction. Default: close
        # them over the jits as compile-time constants instead of call
        # arguments — on relay-attached devices every program invocation
        # re-ships its argument buffers, and the ~73 MB ContextSkip tree
        # costs ~2 s PER CALL; baked in, it ships once at compile and
        # per-iteration scoring is pure compute (measured 2.0 s -> 0.04 s
        # for the 6,250-frame encode).
        #
        # BUT the relay's compile endpoint bounds its request body: baking
        # a very large tree (ContextFeat is 153M params = 292 MB bf16) makes
        # remote_compile fail with HTTP 413. Above a byte threshold
        # (IFO_TPU_MAX_BAKED_PARAM_MB, default 128) params are passed as jit
        # ARGUMENTS instead — device_put once, re-shipped per call by the
        # relay (~4 s for ContextFeat; warmup + one scoring call per RL
        # iteration keeps that amortized).
        comp = self.inference_dtype
        if comp != jnp.float32:
            # frozen-params inference: cast every f32 leaf (weights AND batch
            # stats) to the MXU-native dtype once at bake time; activations
            # entering the net are cast to match so the convs run native bf16
            params = jax.tree_util.tree_map(
                lambda p: p.astype(comp) if getattr(p, "dtype", None) == jnp.float32 else p,
                self.params,
            )
        else:
            params = self.params

        def _tree_bytes(tree) -> int:
            return sum(
                int(np.prod(p.shape)) * jnp.dtype(p.dtype).itemsize
                for p in jax.tree_util.tree_leaves(tree)
                if hasattr(p, "shape")
            )

        max_baked = int(os.environ.get("IFO_TPU_MAX_BAKED_PARAM_MB", "128")) * 2**20
        params_dev = None  # lazily device_put once, shared by unbaked binds

        def bind(fn, touched=None):
            """Close params in as XLA constants, or pre-bind a device-resident
            tree passed as the leading jit argument (trees that would blow the
            relay's compile-body limit — every call then re-ships the tree).

            The bake decision is per-FUNCTION: only leaves the trace actually
            references serialize into the compile request, so a method that
            reads one submodule (``encode`` -> params['params']['conv']) is
            budgeted by THAT subtree (``touched``), not the full model. For
            ContextFeat (292 MB bf16 total, unbakeable) this keeps the
            per-iteration scoring call params-free — pure compute — while
            only the one-time warmup translate pays the argument re-ship."""
            nonlocal params_dev
            t_bytes = _tree_bytes(params if touched is None else touched)
            if t_bytes <= max_baked:
                return jax.jit(lambda *a: fn(params, *a))
            jitted = jax.jit(fn)
            if params_dev is None:
                params_dev = jax.device_put(params)
            return lambda *a: jitted(params_dev, *a)

        if hasattr(model, "translate_one_ctx"):
            # warmup fast path: one shared agent context per viewpoint —
            # encode it ONCE per chunk instead of once per demo frame
            def translate_chunk_ctx1(params, src, ctx1):
                z, out = model.apply(
                    params, src.astype(comp), ctx1.astype(comp), method="translate_one_ctx"
                )
                return z.astype(jnp.float32), out.astype(jnp.float32)

        else:

            def translate_chunk_ctx1(params, src, ctx1):
                ctx_b = jnp.broadcast_to(ctx1, (src.shape[0], *ctx1.shape[1:]))
                z, out = model.apply(
                    params, src.astype(comp), ctx_b.astype(comp), method="translate"
                )
                return z.astype(jnp.float32), out.astype(jnp.float32)

        def score_paths(params, x, means, mean_imgs, scale):
            """x [P, T, V, ...] in model space — or raw uint8 frames, which
            normalize ON DEVICE (ship 1/4 the bytes over PCIe/relay);
            means [V, T, F]; mean_imgs [V, T, ...] -> (costs [P, T],
            per-viewpoint term means [V] for feat and scaled-pixel — the RL
            tabular's reward decomposition, RewardFeatTerm/RewardPixTerm)."""
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 127.5 - 1.0
            P, T, V = x.shape[:3]
            flat = x.reshape(P * T * V, *x.shape[3:])
            # encode runs in the MXU compute dtype; costs reduce in f32
            feats = model.apply(params, flat.astype(comp), method="encode")
            feats = feats.astype(jnp.float32)
            feats = feats.reshape(P, T, V, -1).transpose(0, 2, 1, 3)  # [P,V,T,F]
            imgs = jnp.moveaxis(x, 2, 1)  # [P,V,T,...]
            feat_cost = jnp.sum((means[None] - feats) ** 2, axis=-1)  # [P,V,T]
            pix_axes = tuple(range(3, imgs.ndim))
            pix_cost = jnp.sum((mean_imgs[None] - imgs) ** 2, axis=pix_axes)
            if self.cfg.ablation == "nofeat":
                costs = scale * pix_cost
            elif self.cfg.ablation == "noimage":
                costs = feat_cost
            else:
                costs = feat_cost + scale * pix_cost
            terms = (jnp.mean(feat_cost, axis=(0, 2)), scale * jnp.mean(pix_cost, axis=(0, 2)))
            return jnp.sum(costs, axis=1), terms  # vp-sum -> [P, T]; ([V], [V])

        def recon_paths(params, x, context):
            """Autoencode agent frames through their own context; pixel L2 to
            the originals (the 'recon' ablation's image term). x [P,T,V,...]
            and context [V,...] in model space, or uint8 (normalized here)."""
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 127.5 - 1.0
            if context.dtype == jnp.uint8:
                context = context.astype(jnp.float32) / 127.5 - 1.0
            P, T, V = x.shape[:3]
            flat = x.reshape(P * T * V, *x.shape[3:])
            ctx = jnp.broadcast_to(context, (P, T, *context.shape)).reshape(
                P * T * V, *context.shape[1:]
            )
            _, out = model.apply(params, flat.astype(comp), ctx.astype(comp), method="translate")
            out = out.astype(jnp.float32)
            pix_axes = tuple(range(1, out.ndim))
            err = jnp.sum((out - flat) ** 2, axis=pix_axes).reshape(P, T, V)
            return jnp.sum(err, axis=-1)

        # encode touches only the image-encoder submodule — budget its bake
        # by that subtree (see bind)
        enc_tree = None
        try:
            enc_tree = params["params"]["conv"]
        except (TypeError, KeyError, IndexError):
            pass  # unknown layout: bind falls back to full-tree budgeting
        self._params_baked = _tree_bytes(params) <= max_baked
        self._translate_chunk_ctx1 = bind(translate_chunk_ctx1)
        self._score_paths = bind(score_paths, touched=enc_tree)
        self._recon_paths = bind(recon_paths)

    # -- model-space mapping ------------------------------------------------
    def _frames_to_model_space(self, frames_u8: np.ndarray) -> np.ndarray:
        """uint8 frames [..., H, W, C] -> the translation model's input space:
        [-1, 1] pixels (ours) or backbone feature maps (oursinception,
        base.py:122-137 routes frames through Inception Mixed_7c first)."""
        if self.cfg.mode == "oursinception":
            lead = frames_u8.shape[:-3]
            flat = frames_u8.reshape(-1, *frames_u8.shape[-3:])
            feats = np.asarray(self.feature_fn(flat), np.float32)
            return feats.reshape(*lead, *feats.shape[1:])
        return frames_u8.astype(np.float32) / 127.5 - 1.0

    def _demos_to_model_space(self, vids: np.ndarray) -> np.ndarray:
        """demo chunk [T, n, ...]: stored [-1,1] frames (ours) or uint8 frames
        routed through the backbone (oursinception, base.py:211-215)."""
        if self.cfg.mode == "oursinception":
            return self._frames_to_model_space(vids)
        return vids

    # -- device featurize (oursinception) -----------------------------------
    def _featurize_device(self, frames_u8):
        """uint8 frames [B, H, W, 3] (device or host) -> backbone feature maps
        ON DEVICE, in the backbone's fixed chunk-size programs (last chunk
        padded). The host ``feature_fn`` path round-trips ~1 MB/frame of
        Mixed_7c activations over the relay; at RL scoring scale that was the
        dominant reward-eval cost — this keeps every activation resident."""
        cf, c = self.feature_fn.chunk_fn, self.feature_fn.chunk
        frames_u8 = jnp.asarray(frames_u8)
        n = int(frames_u8.shape[0])
        outs = []
        for s in range(0, n, c):
            sl = frames_u8[s : s + c]
            if sl.shape[0] < c:
                sl = jnp.concatenate([sl, jnp.repeat(sl[-1:], c - sl.shape[0], 0)])
            outs.append(cf(sl))
        return outs[0][:n] if len(outs) == 1 else jnp.concatenate(outs)[:n]

    # -- warmup: demo translation cache (base.py:195-226) ------------------
    def _warmup(self, context_frames: np.ndarray) -> None:
        """context_frames: uint8 [V, H, W, C] — frame 0 of the first rollout.

        Means accumulate ON DEVICE across chunks; only the final [T, ...]
        means are fetched. (The earlier per-chunk fetch of every translated
        demo was ~1 MB/frame over the relay — at the reference's demo counts
        that is tens of GB of warmup download for two small means.)"""
        T, N = self.demo_data.shape[:2]
        use_dev = self.cfg.mode == "oursinception" and hasattr(self.feature_fn, "chunk_fn")
        self.means, self.imgs = [], []
        for vp in range(self.nvp):
            if use_dev:
                ctx1 = self._featurize_device(jnp.asarray(context_frames[vp])[None])
            else:
                ctx1 = jnp.asarray(self._frames_to_model_space(context_frames[vp]))[None]
            z_sum = out_sum = None
            c = self.chunk_videos
            for start in range(0, N, c):
                vids = self.demo_data[:, start : start + c]  # [T, n, ...]
                n = vids.shape[1]
                flat = np.moveaxis(vids, 1, 0).reshape(n * T, *vids.shape[2:])
                if use_dev:
                    src = self._featurize_device(flat)
                else:
                    src = jnp.asarray(
                        self._frames_to_model_space(flat)
                        if flat.dtype == np.uint8
                        else flat
                    )
                z, out = self._translate_chunk_ctx1(src, ctx1)
                z = jnp.sum(z.reshape(n, T, -1), axis=0)
                out = jnp.sum(out.reshape(n, T, *out.shape[1:]), axis=0)
                z_sum = z if z_sum is None else z_sum + z
                out_sum = out if out_sum is None else out_sum + out
            self.means.append(np.asarray(z_sum, np.float32) / N)  # [T, F]
            self.imgs.append(np.asarray(out_sum, np.float32) / N)  # [T, ...]

    def _gather_device_frames(self, paths):
        """Assemble the scoring batch from the sampler's device-resident
        episode blocks (``path["frames_dev"] = (block [T,N,V,...], env_idx)``,
        VectorizedSampler.obtain_samples) -> (batch [P,T,V,...] uint8 on
        device, ctx uint8 [V,H,W,C] on host). One tiny host fetch (the warmup
        context frame) instead of the full 4*P*T*V*H*W byte round trip."""
        T = min(len(p["rewards"]) // 2 for p in paths)
        T = min(T, min(int(p["frames_dev"][0].shape[0]) for p in paths))
        parts, cur_block, idxs = [], None, []

        def flush():
            if idxs:
                sub = cur_block[:T, jnp.asarray(np.asarray(idxs))]
                parts.append(jnp.moveaxis(sub, 0, 1))  # [P_b, T, V, ...]

        for p in paths:
            block, i = p["frames_dev"]
            if block is not cur_block:
                flush()
                cur_block, idxs = block, []
            idxs.append(int(i))
        flush()
        batch = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        b0, i0 = paths[0]["frames_dev"]
        ctx_u8 = np.asarray(b0[0, int(i0)])  # [V, H, W, C]
        return batch, ctx_u8

    def _check_shared_context(self, paths) -> None:
        """Enforce the fixed-context contract (SURVEY §7 / CLAUDE.md): the
        warmup takes ONE context frame (rollout 0's) for the whole batch, so
        every path must come from the same pinned scene draw. Samplers stamp
        ``path["context_fp"]`` with the vec env's scene fingerprint (sha1 of
        cameras + context geom colors/positions; the sentinel ``"mixed"``
        when per-env scenes differ — the demo-recording configuration).
        Unstamped paths (legacy samplers, hand-built tests) skip the check;
        a stamped mixed/mismatched batch would silently score every rollout
        against the wrong context, so it raises instead."""
        fps = {p["context_fp"] for p in paths if "context_fp" in p}
        if not fps:
            return
        if "mixed" in fps or len(fps) > 1:
            raise ValueError(
                "reward engine got rollouts from more than one scene context "
                f"(fingerprints {sorted(fps)}): the translated-demo cache is "
                "built for ONE pinned context (exp.launchers.sample_rl_context "
                "protocol) — pin the scene in the env config, or drop "
                "per-path 'context_fp' stamps to bypass (tests only)"
            )

    # -- per-iteration splice ---------------------------------------------
    def process(self, paths: list[dict[str, Any]]) -> list[dict[str, Any]]:
        mode = self.cfg.mode
        if mode == "none":
            return paths
        if mode == "oracle":
            for p in paths:
                p["rewards"] = p["rewards"] + np.asarray(p["env_infos"]["reward_true"], np.float64)
            return paths
        if mode in ("inception", "inceptionsame"):
            return self._process_inception(paths)

        # -- ours / oursinception ------------------------------------------
        self._check_shared_context(paths)
        if paths and "frames_dev" in paths[0]:
            # device-resident fast path: frames never left the chip after the
            # raycast render; gather/transpose them on device and skip the
            # host restack + re-upload entirely. oursinception additionally
            # routes them through the backbone ON DEVICE (_featurize_device).
            if mode == "oursinception" and not hasattr(self.feature_fn, "chunk_fn"):
                raise ValueError(
                    "device-resident frames with mode 'oursinception' need a "
                    "feature_fn exposing chunk_fn (make_inception_feature_fn) "
                    "— a host-only backbone would force a frame round trip"
                )
            missing = sum("frames_dev" not in p for p in paths)
            if missing:
                raise ValueError(
                    f"mixed batch: {missing}/{len(paths)} paths lack frames_dev "
                    "— a sampler must hand the engine all-device or all-host frames"
                )
            batch_u8, ctx_u8 = self._gather_device_frames(paths)
            T = int(batch_u8.shape[1])
        else:
            frame_stacks, frame_counts = [], []
            for p in paths:
                frames = [f for f in p["env_infos"].get("frames", []) if f is not None]
                if not frames:
                    raise ValueError(
                        f"reward mode {mode!r} needs rendered frames in "
                        "env_infos['frames'] — configure the env with render_frames=True"
                    )
                frame_stacks.append(np.stack(frames))  # [T, V, H, W, C]
                frame_counts.append(len(frames))
            T = min(frame_counts)
            batch_u8 = np.stack([f[:T] for f in frame_stacks])  # [P, T, V, H, W, C]
            ctx_u8 = batch_u8[0, 0]  # first rollout's first rendered frame

        if self.means is None:
            self._warmup(ctx_u8)
            # warmup cache lives on device; re-upload only if T changes
            self._means_dev, self._imgs_dev, self._cache_T = None, None, -1
        if getattr(self, "_cache_T", -1) != T:
            self._means_dev = jnp.asarray(np.stack(self.means)[:, :T])
            self._imgs_dev = jnp.asarray(np.stack(self.imgs)[:, :T])
            self._cache_T = T
        means, mean_imgs = self._means_dev, self._imgs_dev
        # mode "ours": ship raw uint8 (4x fewer bytes over the relay/PCIe)
        # and normalize inside the jitted scorer. oursinception: run the
        # backbone ON DEVICE whenever the feature_fn exposes its jitted chunk
        # map — device-resident frames never touch the host at all, and host
        # frames upload once as uint8 (the legacy host feature_fn round-trips
        # ~1 MB/frame of activations back over the relay).
        if self.cfg.mode == "ours":
            batch = batch_u8
        elif hasattr(self.feature_fn, "chunk_fn"):
            lead = batch_u8.shape[:3]  # [P, T, V]
            flat = jnp.asarray(batch_u8).reshape(-1, *batch_u8.shape[3:])
            feats = self._featurize_device(flat)
            batch = feats.reshape(*lead, *feats.shape[1:])
        else:
            batch = self._frames_to_model_space(np.asarray(batch_u8))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = self.mesh.devices.size
            pad = (-len(batch)) % n_dev
            if pad:  # jnp keeps an already-device-resident batch on device
                batch = jnp.concatenate([batch, jnp.repeat(batch[-1:], pad, axis=0)])
            batch = jax.device_put(jnp.asarray(batch), NamedSharding(self.mesh, P("data")))
        else:
            batch = jnp.asarray(batch)

        if self.cfg.ablation == "recon":
            scored, terms = self._score_paths(batch, means, mean_imgs, 0.0)
            feat = np.asarray(scored)
            if self.cfg.mode != "ours" and hasattr(self.feature_fn, "chunk_fn"):
                ctx_model = self._featurize_device(jnp.asarray(ctx_u8))
            else:
                ctx_model = jnp.asarray(self._frames_to_model_space(ctx_u8))
            recon = np.asarray(self._recon_paths(batch, ctx_model))
            costs = feat + self.cfg.scale * recon
            terms = (np.asarray(terms[0]), self.cfg.scale * recon.mean(keepdims=True))
        else:
            scored, terms = self._score_paths(batch, means, mean_imgs, self.cfg.scale)
            costs = np.asarray(scored)
        # reward decomposition for the RL tabular (per-term means, per
        # viewpoint): which term is driving — or drowning — the signal is the
        # first question every flat-success study asks (VERDICT r4 item 4)
        feat_t, pix_t = (np.asarray(t, np.float64).reshape(-1) for t in terms)
        diag = {
            "RewardFeatTerm": float(feat_t.sum()),
            "RewardPixTerm": float(pix_t.sum()),
        }
        if self.nvp > 1 and len(feat_t) == self.nvp:
            for v in range(self.nvp):
                diag[f"RewardFeatTerm_v{v}"] = float(feat_t[v])
                diag[f"RewardPixTerm_v{v}"] = float(pix_t[v])
        self.last_diagnostics = diag
        # splice: rendered frame j came from env step 2j+1 (base.py:256-257)
        for p, cost in zip(paths, costs):
            for j in range(T):
                p["rewards"][j * 2 + 1] -= cost[j] * (j**2)
        return paths

    def set_expert_stats(self, means: np.ndarray, std: np.ndarray) -> None:
        """Provide backbone-activation statistics directly (the
        ``inceptionsame`` path, base.py:93-111: means/std computed from fresh
        expert rollouts instead of a mean file). Use
        :func:`compute_expert_feature_stats` to build them."""
        self.feat_means = np.asarray(means)
        self.feat_std = np.asarray(std)

    def _process_inception(self, paths):
        """z-scored squared error of backbone activations vs expert means
        (base.py:179-189)."""
        if self.feat_means is None:
            data = np.load(self.cfg.mean_file)
            self.feat_means = data[self.cfg.inception_layer]
            self.feat_std = data[self.cfg.inception_layer + "std"]
        for p in paths:
            frames = [f[0] for f in p["env_infos"]["frames"] if f is not None]
            feat = np.asarray(self.feature_fn(np.stack(frames)))
            diff = self.feat_means - feat
            diff[self.feat_std == 0] = 0
            diff = diff**2 / (self.feat_std + 1e-5)
            means = np.mean(diff, axis=tuple(range(1, diff.ndim)))
            for j in range(len(frames)):
                p["rewards"][j * 2 + 1] -= means[j] * (j**2)
        return paths
