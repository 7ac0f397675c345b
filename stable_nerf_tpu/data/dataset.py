"""Paired reference/target dataset for joint Stable-NeRF training.

Numpy equivalent of reference datasets/dataset.py (StableNeRFDataset +
collate_fn), keeping its deliberate quirks for parity:

  * tiny-NeRF branch pairs each image with a shuffled partner and hardcodes
    intrinsics [138, 138, encW//2, encH//2]           (dataset.py:40-48);
  * objaverse branch takes views 0/1 as reference/target, and computes the
    focal as ``W / (2·tan(47.1))`` — the reference feeds *degrees* into tan
    as radians; reproduced as-is                       (dataset.py:56-58);
  * rays are precomputed for ALL samples at the *encoded* (latent) resolution
    (dataset.py:62-73).

No torch DataLoader: batches are plain numpy dicts from ``iterate`` /
``collate``; device transfer + double-buffering lives in data/prefetch.py.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .preprocess import load_data
from .rays import get_rays

import jax

SAMPLE_KEYS = (
    "target_image", "reference_image", "target_pose", "reference_pose",
    "target_rays_o", "target_rays_d", "target_rays_inds",
    "reference_rays_o", "reference_rays_d", "reference_rays_inds",
)


class StableNeRFDataset:
    """Holds paired (reference, target) images/poses/rays in host RAM."""

    def __init__(
        self,
        dataset_name: str = "objaverse",
        shape=(512, 512),
        encoded_shape=(128, 128),
        mean=(0.5, 0.5, 0.5),
        std=(0.5, 0.5, 0.5),
        fix_choices: Optional[Tuple[int, int]] = (0, 1),
        percent_objects: float = 0.1,
        root: str = "datasets",
        seed: int = 0,
        scale_intrinsics: bool = False,
    ):
        """``scale_intrinsics`` (beyond the reference): rescale the capture's
        true pixel focal to the encoded (ray) resolution instead of the
        parity quirk's hardcoded 138 (dataset.py:40-48).  At the
        reference's encoded 64 the quirk is a mild FOV mismatch; at a
        16×16 latent it collapses the ray bundle to a ~7° crop against a
        ~50° ground-truth image, so the learned-diffusion demo opts into
        the geometric focal."""
        if isinstance(shape, int):
            shape = (shape, shape)
        if isinstance(encoded_shape, int):
            encoded_shape = (encoded_shape, encoded_shape)
        self.H, self.W = shape
        self.encoded_H, self.encoded_W = encoded_shape

        images, poses, norm_intrinsic = load_data(
            dataset=dataset_name, shape=shape, mean=mean, std=std,
            fix_choices=fix_choices, percent_objects=percent_objects, root=root,
        )
        images = np.asarray(images, np.float32)
        poses = np.asarray(poses, np.float32)

        if images.ndim == 4:
            # single-scene nerf data: partner = shuffled copy (dataset.py:40-48)
            rng = np.random.default_rng(seed)
            perm = rng.permutation(images.shape[0])
            self.reference_images, self.target_images = images, images[perm]
            self.reference_poses, self.target_poses = poses, poses[perm]
            if scale_intrinsics:
                # the capture's true pixel focal at the ray resolution
                self.intrinsic = np.array(
                    [norm_intrinsic[0, 0] * self.encoded_W,
                     norm_intrinsic[1, 1] * self.encoded_H,
                     self.encoded_W // 2, self.encoded_H // 2],
                    np.float32,
                )
            else:
                self.intrinsic = np.array(
                    [138.0, 138.0, self.encoded_W // 2, self.encoded_H // 2],
                    np.float32,
                )
        else:
            # objaverse [O, 2, ...]: view 0 = reference, view 1 = target
            self.reference_images = images[:, 0]
            self.target_images = images[:, 1]
            self.reference_poses = poses[:, 0]
            self.target_poses = poses[:, 1]
            fov = 47.1
            # degrees-as-radians quirk reproduced (dataset.py:56-58)
            fov_x = self.W / (2 * math.tan(fov / 2))
            fov_y = self.H / (2 * math.tan(fov / 2))
            self.intrinsic = np.array(
                [fov_x, fov_y, self.encoded_W // 2, self.encoded_H // 2],
                np.float32,
            )

        # precompute full-image rays at encoded resolution (dataset.py:62-73)
        self.reference_rays = {
            k: np.asarray(v) for k, v in get_rays(
                self.reference_poses, self.intrinsic,
                self.encoded_H, self.encoded_W,
            ).items()
        }
        self.target_rays = {
            k: np.asarray(v) for k, v in get_rays(
                self.target_poses, self.intrinsic,
                self.encoded_H, self.encoded_W,
            ).items()
        }

    def __len__(self) -> int:
        return self.target_images.shape[0]

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {
            "target_image": self.target_images[idx],
            "reference_image": self.reference_images[idx],
            "target_pose": self.target_poses[idx],
            "reference_pose": self.reference_poses[idx],
            "target_rays_o": self.target_rays["rays_o"][idx],
            "target_rays_d": self.target_rays["rays_d"][idx],
            "target_rays_inds": self.target_rays["inds"][idx],
            "reference_rays_o": self.reference_rays["rays_o"][idx],
            "reference_rays_d": self.reference_rays["rays_d"][idx],
            "reference_rays_inds": self.reference_rays["inds"][idx],
        }

    def all_poses(self) -> np.ndarray:
        """[2·N, 4, 4] reference+target poses for mark_untrained_grid
        (reference train.py:190)."""
        return np.concatenate([self.reference_poses, self.target_poses], axis=0)


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict
    (reference dataset.py:105-113)."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0].keys()}


def split_dataset(
    n: int, train_frac: float = 0.8, val_frac: float = 0.1, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random 80/10/10 index split (reference train.py:164-170)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int(train_frac * n)
    n_val = int(val_frac * n)
    return (perm[:n_train], perm[n_train:n_train + n_val],
            perm[n_train + n_val:])


def iterate(
    dataset: StableNeRFDataset,
    indices: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Minibatch iterator over a subset of the dataset.

    drop_last=True keeps batch shapes static (one XLA compilation), the
    TPU-native replacement for the reference's varying last batch.
    """
    idx = np.array(indices)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    if drop_last and 0 < len(idx) < batch_size:
        # A split smaller than the batch would otherwise yield ZERO batches
        # (easy to hit with the reference's tiny percent_objects datasets).
        # Pad by repeating indices so the caller still sees one full batch.
        import warnings

        warnings.warn(
            f"split has {len(idx)} samples < batch_size={batch_size}; "
            f"padding by repetition to one full batch", stacklevel=2,
        )
        idx = np.resize(idx, batch_size)
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    for s in range(0, end, batch_size):
        chunk = idx[s:s + batch_size]
        yield collate([dataset[int(i)] for i in chunk])
