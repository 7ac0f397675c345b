from .sharding import (
    barrier,
    make_mesh,
    make_parallel_train_step,
    process_shard_indices,
    replicate,
    shard_batch,
)

__all__ = [
    "barrier",
    "make_mesh",
    "make_parallel_train_step",
    "process_shard_indices",
    "replicate",
    "shard_batch",
]
