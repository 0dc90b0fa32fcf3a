"""Demo-video dataset builder and (src, tgt) pair sampler.

Reproduces the reference ingest (scripts/train_script.py:59-96): decode each
demo video, keep only 51-frame recordings, subsample frames ``1..50`` by
``n_skip``, resize+rescale, reject all-black frames, tolerate up to 10 decode
failures, and stack to ``vdata[T, N, H, W, C]``. The pair sampler mirrors the
batching trick at train_script.py:153-158: batch row ``j`` holds frame
``j % T`` of a randomly chosen video, so each (src, tgt) batch column is a
time-aligned frame pair, with ``tgtctx`` = frame 0 of the target video.
"""

from __future__ import annotations

import glob as globlib
import os

import numpy as np

from imitation_from_observation_tpu.core.log import get_logger
from imitation_from_observation_tpu.video.io import VideoDecodeError, decode_video
from imitation_from_observation_tpu.video.preprocess import transform


def load_vdata_cache(cache_path: str, build_params: dict, mmap_mode=None):
    """Load a cached vdata array ONLY when it matches ``build_params``.

    A cache written under different n_videos/image_size/n_skip would
    silently feed a mismatched dataset downstream. Params live in a sidecar
    ``<cache>.params.json``; legacy caches without one are checked on shape
    alone. Returns None (caller rebuilds) on mismatch or missing file.
    """
    if not os.path.exists(cache_path):
        return None
    cached = np.load(cache_path, mmap_mode=mmap_mode)
    nlen_want = (build_params["video_len"] - 1 + build_params["n_skip"] - 1) // build_params["n_skip"]
    ok = cached.shape[0] == nlen_want and cached.shape[2:4] == tuple(build_params["image_size"])
    meta_path = cache_path + ".params.json"
    if ok and os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as f:
            ok = _json.load(f) == build_params
    elif ok:
        ok = cached.shape[1] <= build_params["n_videos"]
    if ok:
        return cached
    get_logger().log(
        f"vdata cache {cache_path} shape {cached.shape} does not match "
        f"build params {build_params} — rebuilding"
    )
    return None


def vdata_build_params(
    n_videos: int, video_len: int, n_skip: int, image_size, rescale: bool, seed: int
) -> dict:
    """The canonical cache-validation params dict (see load_vdata_cache)."""
    return dict(
        n_videos=int(n_videos), video_len=int(video_len), n_skip=int(n_skip),
        image_size=[int(s) for s in image_size], rescale=bool(rescale),
        seed=int(seed),
    )


def build_video_dataset(
    pattern: str,
    image_size: tuple[int, int],
    n_videos: int,
    video_len: int = 51,
    n_skip: int = 1,
    rescale: bool = True,
    max_failures: int = 10,
    seed: int = 0,
    cache_path: str | None = None,
) -> np.ndarray:
    """Build ``vdata[T, N, H, W, C]`` from demo videos matching ``pattern``."""
    log = get_logger()
    build_params = vdata_build_params(n_videos, video_len, n_skip, image_size, rescale, seed)
    if cache_path and os.path.exists(cache_path):
        cached = load_vdata_cache(cache_path, build_params)
        if cached is not None:
            return cached
    files = sorted(globlib.glob(pattern))
    rng = np.random.default_rng(seed)
    rng.shuffle(files)
    nlen = (video_len - 1 + n_skip - 1) // n_skip
    idata: list[list[np.ndarray]] = [[] for _ in range(nlen)]
    n_ok, n_fail = 0, 0
    for name in files:
        if n_ok >= n_videos:
            break
        try:
            vid = decode_video(name)
            if len(vid) != video_len:
                log.log(f"skip {name}: {len(vid)} frames (want {video_len})")
                continue
            frames = []
            for j in range(1, video_len, n_skip):
                frame = transform(vid[j], image_size[0], image_size[1], rescale)
                if rescale and np.max(frame) == -1:  # all-black render
                    log.log(f"rip {n_ok} {name}")
                    frames = []
                    break
                frames.append(frame)
            if len(frames) != nlen:
                continue
            for j, f in enumerate(frames):
                idata[j].append(f)
            n_ok += 1
        except VideoDecodeError as e:
            n_fail += 1
            log.log(f"decode failure ({n_fail}): {e}")
            if n_fail > max_failures:
                break
    if not idata[0]:
        raise VideoDecodeError(f"no usable videos under {pattern!r}")
    dtype = np.float32 if rescale else np.uint8
    vdata = np.asarray(idata, dtype=dtype)
    if cache_path:
        import json as _json

        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.save(cache_path, vdata)
        with open(cache_path + ".params.json", "w") as f:
            _json.dump(build_params, f)
    return vdata


class PairSampler:
    """Samples [srcdata, tgtctx, tgtdata] batches from ``vdata[T, N, ...]``."""

    def __init__(self, vdata: np.ndarray, batch_size: int, seed: int = 0):
        self.vdata = vdata
        self.batch_size = batch_size
        self.nlen = vdata.shape[0]
        self.n_videos = vdata.shape[1]
        self._rng = np.random.default_rng(seed)
        self._frame_idx = np.arange(batch_size) % self.nlen

    def sample(self, rng: np.random.Generator | None = None):
        rng = rng or self._rng
        choice_src = rng.integers(0, self.n_videos, self.batch_size)
        choice_tgt = rng.integers(0, self.n_videos, self.batch_size)
        src = self.vdata[self._frame_idx, choice_src]
        tgt = self.vdata[self._frame_idx, choice_tgt]
        ctx = self.vdata[0, choice_tgt]
        return src, ctx, tgt

    def sample_aligned(self, rng: np.random.Generator | None = None):
        """One (src video, tgt video) pair replicated across the batch — the
        reference's GIF-dump batch shape (train_script.py:186-190)."""
        rng = rng or self._rng
        vs = int(rng.integers(0, self.n_videos))
        vt = int(rng.integers(0, self.n_videos))
        src = self.vdata[self._frame_idx, vs]
        tgt = self.vdata[self._frame_idx, vt]
        ctx = self.vdata[0, np.full(self.batch_size, vt)]
        return src, ctx, tgt
