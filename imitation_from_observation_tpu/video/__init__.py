from imitation_from_observation_tpu.video.io import (
    VideoDecodeError,
    decode_video,
    save_gif,
    write_mp4,
)
from imitation_from_observation_tpu.video.preprocess import (
    device_preprocess,
    inverse_transform,
    transform,
)
from imitation_from_observation_tpu.video.dataset import (
    PairSampler,
    build_video_dataset,
)

__all__ = [
    "VideoDecodeError",
    "decode_video",
    "save_gif",
    "write_mp4",
    "transform",
    "inverse_transform",
    "device_preprocess",
    "build_video_dataset",
    "PairSampler",
]
