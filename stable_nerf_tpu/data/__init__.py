from .rays import get_rays, rand_poses, nerf_matrix_to_ngp
from .dataset import StableNeRFDataset, collate, iterate, split_dataset
from .prefetch import device_prefetch

__all__ = [
    "get_rays",
    "rand_poses",
    "nerf_matrix_to_ngp",
    "StableNeRFDataset",
    "collate",
    "iterate",
    "split_dataset",
    "device_prefetch",
]
