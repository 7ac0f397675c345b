"""Host-side dataset loading/preprocessing.

Numpy equivalent of reference datasets/preprocess.py, reproducing its
behavior including the intentional quirks (SURVEY.md §7 delta 5):

  * images resized then normalized to mean/std 0.5 → value range [-1, 1];
  * poses run through the ngp axis-swap with translation scale 0.33
    (utils/graphics_utils.py:129-137);
  * objaverse: 2 of 12 views per object, corrupt objects silently dropped
    (preprocess.py:158-159), ``percent_objects`` subsampling of the listing;
  * a "normalized intrinsics" helper that the dataset layer then ignores in
    favor of hardcoded focals — kept for API parity (preprocess.py:25-42).

Threaded decode matches the reference's ThreadPoolExecutor; the optional
C++ loader in ``native/`` accelerates decode+resize when built.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def construct_normalized_camera_intrinsics(
    image_shape, focal_length: float = 50.0, skew: float = 0.0
) -> np.ndarray:
    """Normalized 3×3 intrinsics from a blender-style focal length in mm
    (reference preprocess.py:25-42; sensor width fixed at 36 mm)."""
    sensor_width_mm = 36.0
    focal_px = focal_length * (image_shape[0] / sensor_width_mm)
    return np.array(
        [
            [focal_px / image_shape[0], skew, 0.5],
            [0.0, focal_px / image_shape[1], 0.5],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def preprocess_images(
    images: np.ndarray,
    shape: Tuple[int, int] = (64, 64),
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
) -> np.ndarray:
    """Resize + normalize a stack of float images in [0, 1].

    Returns [N, 3, H, W] float32 (channel-first like torchvision ToTensor).
    Matches reference preprocess.py:45-67 (bilinear PIL resize).
    """
    mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
    std = np.asarray(std, np.float32).reshape(3, 1, 1)
    out = []
    for img in images:
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if Image is not None:
            pil = Image.fromarray(arr).resize(
                (shape[1], shape[0]), Image.BILINEAR
            )
            arr = np.asarray(pil)
        else:  # nearest-neighbor fallback without PIL
            ys = (np.arange(shape[0]) * arr.shape[0] / shape[0]).astype(int)
            xs = (np.arange(shape[1]) * arr.shape[1] / shape[1]).astype(int)
            arr = arr[ys][:, xs]
        chw = arr.astype(np.float32).transpose(2, 0, 1) / 255.0
        out.append((chw - mean) / std)
    return np.stack(out)


def load_nerf_data(
    shape=(64, 64), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    root: str = "datasets", filename: str = "tiny_nerf_data.npz",
    expect_scene: Optional[str] = None,
):
    """tiny_nerf_data.npz-layout loader (reference preprocess.py:70-112).

    Returns (images [N, 3, H, W], poses [N, 4, 4] ngp convention,
    intrinsics 3×3 normalized).

    Guard (VERDICT r2 next #6): files written by make_synthetic_scene.py
    carry a ``scene`` marker key.  Loading a marked file as the real
    tiny-NeRF dataset (``expect_scene=None``) raises, so a tiny-NeRF
    parity claim can never silently be measured on the synthetic scene.
    """
    from .rays import nerf_matrix_to_ngp

    path = os.path.join(root, "nerf", filename)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — download/generate {filename} into {root}/nerf/"
        )
    data = np.load(path, allow_pickle=True)
    marker = str(data["scene"]) if "scene" in data.files else None
    if expect_scene is None and marker is not None:
        raise ValueError(
            f"{path} carries scene marker {marker!r} — it is a generated "
            f"synthetic scene, not tiny-NeRF data.  Load it with "
            f"dataset='synthetic' (or pass expect_scene={marker!r})."
        )
    if expect_scene is not None and marker != expect_scene:
        raise ValueError(
            f"{path}: expected scene marker {expect_scene!r}, found "
            f"{marker!r} — regenerate with scripts/make_synthetic_scene.py."
        )
    native_h, native_w = data["images"].shape[1:3]
    images = preprocess_images(data["images"], shape, mean, std)
    poses = data["poses"][:, :-1, :]           # drop the redundant last row
    poses = np.stack([nerf_matrix_to_ngp(p) for p in poses])
    # tiny-NeRF's ``focal`` is a PIXEL focal at the capture resolution
    # (138.9 at 100², or the generator's value for the synthetic scene) —
    # normalize by the native size, not the blender-mm formula (which
    # reads 138 as millimetres).  StableNeRFDataset's parity branch
    # ignores this and hardcodes [138, 138, W/2, H/2] (reference
    # dataset.py:48); scale_intrinsics=True consumes it.
    focal = float(data["focal"])
    intrinsic = np.array(
        [[focal / native_w, 0.0, 0.5],
         [0.0, focal / native_h, 0.5],
         [0.0, 0.0, 1.0]], dtype=np.float32)
    return images, poses, intrinsic


def load_objaverse_data(
    shape=(64, 64),
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    fix_choices: Optional[Tuple[int, int]] = (0, 1),
    percent_objects: float = 0.001,
    root: str = "datasets",
    rng: Optional[np.random.Generator] = None,
):
    """Objaverse views_release loader (reference preprocess.py:115-190).

    2 of 12 views per object (fixed or random choice), threaded decode,
    corrupt objects silently dropped, listing subsampled by percent_objects.

    Returns (images [O, 2, 3, H, W], poses [O, 2, 4, 4], intrinsics 3×3).
    """
    from .rays import nerf_matrix_to_ngp

    assert 0 < percent_objects <= 1, "percent_objects must be in (0, 1]"
    if fix_choices is not None:
        assert len(fix_choices) == 2
        assert all(0 <= c < 12 for c in fix_choices)
    rng = rng or np.random.default_rng()

    dataset_path = os.path.join(root, "objaverse", "views_release")
    if not os.path.isdir(dataset_path):
        raise FileNotFoundError(
            f"{dataset_path} not found — fetch Objaverse views_release first"
        )

    def process(obj_dir):
        try:
            if fix_choices is not None:
                choices = np.asarray(fix_choices)
            else:
                choices = rng.choice(12, 2, replace=False)
            imgs, poses = [], []
            for i in choices:
                img = Image.open(os.path.join(dataset_path, obj_dir, f"{i:03d}.png"))
                imgs.append(np.asarray(img.convert("RGB")) / 255.0)
                pose = np.load(os.path.join(dataset_path, obj_dir, f"{i:03d}.npy"))
                poses.append(nerf_matrix_to_ngp(pose))
            return preprocess_images(np.asarray(imgs), shape, mean, std), np.asarray(poses)
        except Exception:
            return None, None                  # silent drop (preprocess.py:158)

    listing = sorted(os.listdir(dataset_path))
    listing = listing[: int(len(listing) * percent_objects)]
    image_sets, pose_sets = [], []
    with ThreadPoolExecutor() as pool:
        futures = [pool.submit(process, p) for p in listing]
        for fut in as_completed(futures):
            imgs, poses = fut.result()
            if imgs is not None:
                image_sets.append(imgs)
                pose_sets.append(poses)

    if not image_sets:
        raise RuntimeError("no loadable objaverse objects found")
    images = np.stack(image_sets)
    poses = np.stack(pose_sets).astype(np.float32)
    intrinsic = construct_normalized_camera_intrinsics(shape)
    return images, poses, intrinsic


def load_data(
    dataset: str = "objaverse",
    shape=(64, 64),
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    fix_choices=(0, 1),
    percent_objects: float = 0.1,
    root: str = "datasets",
):
    """Dispatch (reference preprocess.py:193-214; "synthetic" is ours —
    the zero-egress PSNR-parity scene, de-aliased from the tiny-NeRF
    filename per VERDICT r2 next #6)."""
    if dataset == "nerf":
        return load_nerf_data(shape, mean, std, root)
    if dataset == "synthetic":
        return load_nerf_data(shape, mean, std, root,
                              filename="synthetic_spheres.npz",
                              expect_scene="synthetic_spheres")
    if dataset == "objaverse":
        return load_objaverse_data(shape, mean, std, fix_choices,
                                   percent_objects, root)
    raise ValueError(
        f'dataset "{dataset}" not in ["nerf", "synthetic", "objaverse"]')
