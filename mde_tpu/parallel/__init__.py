from . import distributed
from .mesh import (
    active_mesh,
    get_active_mesh,
    set_active_mesh,
    make_mesh,
    make_training_mesh,
    clamp_data_axis,
    shard_batch,
    replicate,
    data_sharding,
    tp_param_spec,
    shard_params_tp,
)

__all__ = [
    "distributed",
    "active_mesh",
    "get_active_mesh",
    "set_active_mesh",
    "make_mesh",
    "make_training_mesh",
    "clamp_data_axis",
    "shard_batch",
    "replicate",
    "data_sharding",
    "tp_param_spec",
    "shard_params_tp",
]
