from imitation_from_observation_tpu.ops.pallas.fused import (
    dense_lrelu,
    pairwise_sqdist,
    pallas_enabled,
)

__all__ = ["dense_lrelu", "pairwise_sqdist", "pallas_enabled"]
