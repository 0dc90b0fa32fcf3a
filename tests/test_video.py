"""Video ingestion tests: transform parity, mp4 roundtrip, dataset builder."""

import os
import numpy as np
import pytest
from PIL import Image

from imitation_from_observation_tpu.video import (
    build_video_dataset,
    decode_video,
    device_preprocess,
    inverse_transform,
    save_gif,
    transform,
    write_mp4,
)
from imitation_from_observation_tpu.video.dataset import PairSampler


def test_transform_matches_scipy_imresize_semantics(rng):
    """scipy.misc.imresize == PIL bilinear resize to uint8, then /127.5-1."""
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    got = transform(img, 48, 48, rescale=True)
    ref = np.asarray(Image.fromarray(img).resize((48, 48), Image.BILINEAR))
    np.testing.assert_allclose(got, ref / 127.5 - 1.0)
    assert got.min() >= -1.0 and got.max() <= 1.0
    raw = transform(img, 36, 64, rescale=False)
    assert raw.dtype == np.uint8 and raw.shape == (36, 64, 3)


def test_inverse_transform():
    x = np.array([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(inverse_transform(x), [0.0, 0.5, 1.0])


def test_device_preprocess_close_to_host(rng):
    img = (rng.random((1, 100, 120, 3)) * 255).astype(np.uint8)
    import jax.numpy as jnp

    dev = np.asarray(device_preprocess(jnp.asarray(img), (48, 48)))[0]
    host = transform(img[0], 48, 48)
    assert dev.shape == host.shape
    # different bilinear kernels (uint8-rounded PIL vs float XLA): close, not equal
    assert np.mean(np.abs(dev - host)) < 0.06


def test_mp4_roundtrip(tmp_path):
    # smooth frames (noise doesn't survive lossy mp4 encoding)
    t, y, x = np.meshgrid(np.arange(51), np.arange(64), np.arange(64), indexing="ij")
    frames = np.stack([(y * 4) % 256, (x * 4) % 256, (t * 5) % 256], axis=-1).astype(np.uint8)
    path = str(tmp_path / "demo.mp4")
    write_mp4(path, frames)
    back = decode_video(path)
    assert back.shape == (51, 64, 64, 3)
    # lossy codec: just require gross agreement
    assert np.mean(np.abs(back.astype(float) - frames.astype(float))) < 12


def _make_demo_videos(tmp_path, n, rng, frames=51, broken=0):
    for i in range(n):
        base = (rng.random((1, 64, 64, 3)) * 200 + 30).astype(np.uint8)
        vid = np.repeat(base, frames, axis=0)
        write_mp4(str(tmp_path / f"demo_{i:03d}.mp4"), vid)
    for i in range(broken):
        (tmp_path / f"broken_{i}.mp4").write_bytes(b"not a video")


def test_build_video_dataset(tmp_path, rng):
    _make_demo_videos(tmp_path, 5, rng)
    _make_demo_videos(tmp_path / "..", 0, rng)  # no-op
    vdata = build_video_dataset(
        str(tmp_path / "*.mp4"), image_size=(48, 48), n_videos=4, n_skip=1
    )
    assert vdata.shape == (50, 4, 48, 48, 3)
    assert vdata.dtype == np.float32
    assert vdata.min() >= -1.0 and vdata.max() <= 1.0


def test_build_video_dataset_skip_and_failures(tmp_path, rng):
    _make_demo_videos(tmp_path, 3, rng, broken=2)
    # a wrong-length video must be skipped
    _make_demo_videos(tmp_path / "sub", 0, rng)
    short = (rng.random((30, 64, 64, 3)) * 255).astype(np.uint8)
    write_mp4(str(tmp_path / "short.mp4"), short)
    vdata = build_video_dataset(
        str(tmp_path / "*.mp4"), image_size=(36, 64), n_videos=10, n_skip=2
    )
    assert vdata.shape == (25, 3, 36, 64, 3)


def test_pair_sampler(rng):
    T, N = 10, 7
    vdata = rng.random((T, N, 4, 4, 3)).astype(np.float32)
    s = PairSampler(vdata, batch_size=20, seed=0)
    src, ctx, tgt = s.sample()
    assert src.shape == (20, 4, 4, 3) and ctx.shape == (20, 4, 4, 3)
    # row j must hold frame j%T of a single video; ctx = frame 0 of tgt video
    for j in range(20):
        fi = j % T
        matches = [(vdata[fi, v] == tgt[j]).all() for v in range(N)]
        assert any(matches)
        v = int(np.argmax(matches))
        np.testing.assert_array_equal(ctx[j], vdata[0, v])


def test_save_gif(tmp_path, rng):
    frames = rng.uniform(-1, 1, (5, 16, 16, 3))
    save_gif(str(tmp_path / "x.gif"), frames)
    img = Image.open(tmp_path / "x.gif")
    assert img.n_frames == 5


def test_native_decoder_matches_cv2(tmp_path):
    """The C++ libav module and OpenCV must agree on decoded frames."""
    pytest.importorskip("ctypes")
    t, y, x = np.meshgrid(np.arange(51), np.arange(32), np.arange(32), indexing="ij")
    frames = np.stack([(y * 8) % 256, (x * 8) % 256, (t * 5) % 256], axis=-1).astype(np.uint8)
    path = str(tmp_path / "nat.mp4")
    write_mp4(path, frames)
    try:
        from imitation_from_observation_tpu.video.native import binding

        native = binding.decode(path)
    except Exception as e:  # toolchain/codec missing on this host
        pytest.skip(f"native decoder unavailable: {e}")
    from imitation_from_observation_tpu.video.io import _decode_cv2

    ref = _decode_cv2(path)
    assert native.shape == ref.shape
    assert np.mean(np.abs(native.astype(float) - ref.astype(float))) < 2.0
    assert binding.frame_count(path) == 51


def test_odd_dimensions_roundtrip(tmp_path, rng):
    """Odd frame sizes (the 299x299 inception config): write_mp4 edge-pads
    to even (4:2:0 needs it; the writer used to silently crop) and the
    native decoder handles unaligned widths without heap corruption (it
    used to sws_scale past a w*3-tight row)."""
    frames = rng.integers(0, 255, (7, 29, 37, 3), dtype=np.uint8)
    path = str(tmp_path / "odd.mp4")
    write_mp4(path, frames)
    from imitation_from_observation_tpu.video.io import _decode_cv2

    ref = _decode_cv2(path)
    assert ref.shape == (7, 30, 38, 3)  # padded, not cropped
    try:
        from imitation_from_observation_tpu.video.native import binding

        native = binding.decode(path)
    except Exception as e:
        pytest.skip(f"native decoder unavailable: {e}")
    assert native.shape == ref.shape
    np.testing.assert_array_equal(native, ref)


def test_ensure_vdata_rebuilds_from_videos(tmp_path, rng):
    """The multi-GB vdata cache is gitignored; ensure_vdata must rebuild it
    from a recipe dir's committed demo mp4s (and then load the cache)."""
    from imitation_from_observation_tpu.core.config import preset
    from imitation_from_observation_tpu.exp.launchers import ensure_vdata

    (tmp_path / "videos").mkdir()
    _make_demo_videos(tmp_path / "videos", 4, rng)
    cfg = preset("push")
    cfg = cfg.replace(
        env=cfg.env.replace(horizon=50),
        train=cfg.train.replace(n_videos=4, n_train=3),
    )
    v1 = ensure_vdata(str(tmp_path), cfg)
    assert v1.shape == (50, 4, 48, 48, 3)
    assert os.path.exists(tmp_path / "translation" / "vdata.npy")
    v2 = ensure_vdata(str(tmp_path), cfg)  # second call loads the cache
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
