from imitation_from_observation_tpu.ops.primitives import (
    conv2d,
    deconv2d,
    linear,
    lrelu,
    conv_kernel_init,
    deconv_kernel_init,
    linear_kernel_init,
)

__all__ = [
    "conv2d",
    "deconv2d",
    "linear",
    "lrelu",
    "conv_kernel_init",
    "deconv_kernel_init",
    "linear_kernel_init",
]
