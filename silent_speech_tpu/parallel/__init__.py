from .mesh import (
    batch_spec,
    bigru_param_specs,
    make_mesh,
    replicated,
    shard_params,
)
from .train_sharded import make_sharded_infer_fn, make_sharded_train_step

__all__ = [
    "batch_spec",
    "bigru_param_specs",
    "make_mesh",
    "replicated",
    "shard_params",
    "make_sharded_infer_fn",
    "make_sharded_train_step",
]
