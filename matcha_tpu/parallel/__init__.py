"""Distributed layer: mesh construction, shardings, TP partition rules."""

from matcha_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    batch_spec,
    current_mesh,
    init_distributed,
    make_mesh,
    put_global_batch,
    replicated,
)
from matcha_tpu.parallel.sharding import param_shardings, param_spec, shard_params

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "batch_spec",
    "current_mesh",
    "replicated",
    "put_global_batch",
    "init_distributed",
    "param_shardings",
    "param_spec",
    "shard_params",
]
