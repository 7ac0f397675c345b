from .joint import (
    JointConfig,
    forward_iteration,
    joint_trainable_mask,
    make_eval_step,
    make_train_step,
)
from .inference import make_inference_step, make_sharded_inference_step

__all__ = [
    "JointConfig",
    "forward_iteration",
    "joint_trainable_mask",
    "make_eval_step",
    "make_train_step",
    "make_inference_step",
    "make_sharded_inference_step",
]
