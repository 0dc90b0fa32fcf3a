"""Video encode/decode.

The reference shells out to ffmpeg twice: the gym monitor's ``ImageEncoder``
subprocess for demo recording (gym/monitoring/video_recorder.py:237-288) and
``imageio.get_reader(name, 'ffmpeg')`` for training ingest
(train_script.py:67). Here decode prefers the native C++ libavformat module
(``video/native``, built lazily) and falls back to OpenCV's bundled FFmpeg;
encode uses OpenCV. GIF eval dumps (train_script.py:23-26) go through PIL.
"""

from __future__ import annotations

import os

import numpy as np

from imitation_from_observation_tpu.video.preprocess import inverse_transform


class VideoDecodeError(RuntimeError):
    pass


def _decode_cv2(path: str) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise VideoDecodeError(f"cannot open {path}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        raise VideoDecodeError(f"no frames decoded from {path}")
    return np.ascontiguousarray(np.stack(frames))


def decode_video(path: str, prefer_native: bool = True) -> np.ndarray:
    """Decode a video file to uint8 RGB frames [T, H, W, 3]."""
    if not os.path.exists(path):
        raise VideoDecodeError(f"no such file: {path}")
    if prefer_native:
        try:
            from imitation_from_observation_tpu.video.native import binding

            return binding.decode(path)
        except Exception:
            pass  # fall through to cv2
    return _decode_cv2(path)


def write_mp4(path: str, frames: np.ndarray, fps: int = 20) -> None:
    """Encode uint8 RGB frames [T, H, W, 3] to mp4.

    Odd dimensions are edge-padded to even first: 4:2:0 chroma subsampling
    needs even W/H, and the cv2 writer otherwise silently crops (a 299x299
    inception demo came back 298x298). Decoded size may therefore exceed the
    input by one row/col — consumers resize to their target (the reference
    likewise resized after decode, train_script.py:67-70).
    """
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    t, h, w, _ = frames.shape
    if h % 2 or w % 2:
        frames = np.pad(frames, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise VideoDecodeError(f"cannot open writer for {path}")
    for f in frames:
        writer.write(np.ascontiguousarray(f[:, :, ::-1]))
    writer.release()


def save_gif(path: str, frames, fps: int = 10) -> None:
    """Save [-1,1]-scaled frames as a GIF (reference savegif, train_script.py:23-26)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [
        Image.fromarray((np.clip(inverse_transform(np.asarray(f)), 0, 1) * 255).astype(np.uint8))
        for f in frames
    ]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0
    )
