from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_train_step,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_parallel_train_step",
]
