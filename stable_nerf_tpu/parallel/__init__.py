from .fsdp import (
    joint_fsdp_shardings,
    joint_fsdp_specs,
    place_joint_for_fsdp,
)
from .sharding import (
    barrier,
    make_mesh,
    make_parallel_train_step,
    process_shard_indices,
    put_sharded,
    replicate,
    shard_batch,
)
from .sp import (
    make_mesh_3d,
    make_sp_unet_apply,
    ring_sdpa,
)
from .tp import (
    joint_param_shardings,
    make_mesh_2d,
    make_tp_unet_apply,
    permute_unet_for_tp,
    place_joint_for_gspmd,
    shard_unet_for_tp,
    unet_tp_shardings,
    unet_tp_specs,
)

__all__ = [
    "barrier",
    "joint_fsdp_shardings",
    "joint_fsdp_specs",
    "joint_param_shardings",
    "place_joint_for_fsdp",
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_3d",
    "make_sp_unet_apply",
    "make_parallel_train_step",
    "make_tp_unet_apply",
    "permute_unet_for_tp",
    "place_joint_for_gspmd",
    "process_shard_indices",
    "put_sharded",
    "replicate",
    "ring_sdpa",
    "shard_batch",
    "shard_unet_for_tp",
    "unet_tp_shardings",
    "unet_tp_specs",
]
