from imitation_from_observation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from imitation_from_observation_tpu.parallel.pp import (
    InceptionPipeline,
    make_mesh_pipe,
)
from imitation_from_observation_tpu.parallel.tp import (
    context_param_specs,
    data_axis_size,
    make_mesh_2d,
    model_axis_size,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "context_param_specs",
    "shard_params",
    "model_axis_size",
    "data_axis_size",
    "InceptionPipeline",
    "make_mesh_pipe",
]
