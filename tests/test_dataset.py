"""Dataset pipeline tests with synthetic on-disk fixtures (no downloads).

Covers the reference's test_dataset.py:7-41 surface plus unit checks of the
reproduced quirks (hardcoded intrinsics, deg-as-rad fov, encoded-res rays)."""

import math
import os

import numpy as np
import pytest

from stable_nerf_tpu.data.dataset import (
    StableNeRFDataset,
    collate,
    iterate,
    split_dataset,
)
from stable_nerf_tpu.data.prefetch import device_prefetch
from stable_nerf_tpu.data.preprocess import (
    construct_normalized_camera_intrinsics,
    load_data,
    preprocess_images,
)


@pytest.fixture(scope="module")
def nerf_root(tmp_path_factory):
    """Fake tiny_nerf_data.npz: 12 random images + orbit-ish poses."""
    root = tmp_path_factory.mktemp("datasets")
    (root / "nerf").mkdir()
    rng = np.random.default_rng(0)
    n = 12
    images = rng.uniform(0, 1, (n, 100, 100, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    np.savez(root / "nerf" / "tiny_nerf_data.npz",
             images=images, poses=poses, focal=np.float32(138.0))
    return str(root)


@pytest.fixture(scope="module")
def objaverse_root(tmp_path_factory):
    """Fake views_release: 3 objects × 12 views (+1 corrupt object)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("datasets2")
    base = root / "objaverse" / "views_release"
    rng = np.random.default_rng(1)
    for obj in range(3):
        d = base / f"obj{obj:03d}"
        d.mkdir(parents=True)
        for v in range(12):
            img = (rng.uniform(0, 255, (80, 80, 3))).astype(np.uint8)
            Image.fromarray(img).save(d / f"{v:03d}.png")
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.normal(size=3)
            np.save(d / f"{v:03d}.npy", pose)
    # corrupt object: missing files → must be silently dropped
    (base / "zzz_corrupt").mkdir()
    return str(root)


class TestPreprocess:
    def test_intrinsics_helper(self):
        K = construct_normalized_camera_intrinsics((64, 64), 50.0)
        focal_px = 50.0 * 64 / 36.0
        np.testing.assert_allclose(K[0, 0], focal_px / 64, rtol=1e-6)
        np.testing.assert_allclose(K[0, 2], 0.5)

    def test_preprocess_images_range_and_layout(self):
        imgs = np.random.default_rng(0).uniform(0, 1, (2, 50, 40, 3))
        out = preprocess_images(imgs, (32, 32))
        assert out.shape == (2, 3, 32, 32)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_load_nerf_data(self, nerf_root):
        images, poses, intr = load_data("nerf", shape=(64, 64), root=nerf_root)
        assert images.shape == (12, 3, 64, 64)
        assert poses.shape == (12, 4, 4)
        np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1], (12, 1)))

    def test_load_objaverse_data(self, objaverse_root):
        images, poses, intr = load_data(
            "objaverse", shape=(32, 32), percent_objects=1.0, root=objaverse_root
        )
        assert images.shape == (3, 2, 3, 32, 32)   # corrupt object dropped
        assert poses.shape == (3, 2, 4, 4)

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            load_data("bogus")


class TestStableNeRFDataset:
    def test_nerf_branch(self, nerf_root):
        ds = StableNeRFDataset("nerf", shape=64, encoded_shape=16, root=nerf_root)
        assert len(ds) == 12
        np.testing.assert_allclose(ds.intrinsic, [138.0, 138.0, 8, 8])
        s = ds[0]
        assert set(s.keys()) == {
            "target_image", "reference_image", "target_pose", "reference_pose",
            "target_rays_o", "target_rays_d", "target_rays_inds",
            "reference_rays_o", "reference_rays_d", "reference_rays_inds",
        }
        assert s["target_image"].shape == (3, 64, 64)
        # rays at ENCODED resolution (16×16), not image resolution
        assert s["target_rays_o"].shape == (16 * 16, 3)
        np.testing.assert_allclose(
            np.linalg.norm(s["target_rays_d"], axis=-1), 1.0, rtol=1e-5)

    def test_objaverse_branch_quirk_intrinsic(self, objaverse_root):
        ds = StableNeRFDataset("objaverse", shape=32, encoded_shape=8,
                               percent_objects=1.0, root=objaverse_root)
        assert len(ds) == 3
        expected_f = 32 / (2 * math.tan(47.1 / 2))   # deg-as-rad, as-is
        np.testing.assert_allclose(ds.intrinsic[0], expected_f, rtol=1e-6)

    def test_all_poses(self, nerf_root):
        ds = StableNeRFDataset("nerf", shape=64, encoded_shape=16, root=nerf_root)
        assert ds.all_poses().shape == (24, 4, 4)

    def test_split_and_iterate(self, nerf_root):
        ds = StableNeRFDataset("nerf", shape=64, encoded_shape=16, root=nerf_root)
        tr, va, te = split_dataset(len(ds), 0.8, 0.1, seed=0)
        assert len(tr) == 9 and len(va) == 1 and len(te) == 2
        assert len(np.intersect1d(tr, te)) == 0
        batches = list(iterate(ds, tr, batch_size=4, shuffle=True))
        assert len(batches) == 2                      # drop_last
        b = batches[0]
        assert b["target_image"].shape == (4, 3, 64, 64)
        assert b["reference_rays_o"].shape == (4, 256, 3)

    def test_device_prefetch(self, nerf_root):
        import jax
        ds = StableNeRFDataset("nerf", shape=64, encoded_shape=16, root=nerf_root)
        tr, _, _ = split_dataset(len(ds), seed=0)
        n = 0
        for batch in device_prefetch(iterate(ds, tr, 4), size=2):
            assert isinstance(batch["target_image"], jax.Array)
            n += 1
        assert n == 2


class TestSyntheticSceneGuard:
    """De-aliasing guard (VERDICT r2 next #6): generated scenes carry a
    'scene' marker; loading one as real tiny-NeRF data must fail."""

    def _write_marked(self, root):
        import numpy as np
        (root / "nerf").mkdir(parents=True, exist_ok=True)
        n, s = 4, 16
        poses = np.stack([np.eye(4, dtype=np.float32)] * n)
        poses[:, 2, 3] = 2.0
        np.savez(root / "nerf" / "synthetic_spheres.npz",
                 images=np.random.default_rng(0).uniform(
                     size=(n, s, s, 3)).astype(np.float32),
                 poses=poses, focal=np.float32(138.0),
                 scene="synthetic_spheres")

    def test_marked_file_rejected_as_nerf(self, tmp_path):
        import shutil
        from stable_nerf_tpu.data.preprocess import load_data
        self._write_marked(tmp_path)
        shutil.copy(tmp_path / "nerf" / "synthetic_spheres.npz",
                    tmp_path / "nerf" / "tiny_nerf_data.npz")
        with pytest.raises(ValueError, match="synthetic"):
            load_data("nerf", shape=(16, 16), root=str(tmp_path))

    def test_synthetic_dispatch_loads_marked_file(self, tmp_path):
        from stable_nerf_tpu.data.preprocess import load_data
        self._write_marked(tmp_path)
        images, poses, intr = load_data("synthetic", shape=(16, 16),
                                        root=str(tmp_path))
        assert images.shape == (4, 3, 16, 16)

    def test_synthetic_dispatch_rejects_unmarked_file(self, tmp_path):
        import numpy as np
        (tmp_path / "nerf").mkdir(parents=True)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        np.savez(tmp_path / "nerf" / "synthetic_spheres.npz",
                 images=np.zeros((2, 8, 8, 3), np.float32),
                 poses=poses, focal=np.float32(138.0))
        from stable_nerf_tpu.data.preprocess import load_data
        with pytest.raises(ValueError, match="marker"):
            load_data("synthetic", shape=(8, 8), root=str(tmp_path))

    def test_committed_scene_loads(self):
        import os
        from stable_nerf_tpu.data.preprocess import load_data
        root = os.path.join(os.path.dirname(__file__), os.pardir, "datasets")
        if not os.path.exists(os.path.join(root, "nerf",
                                           "synthetic_spheres.npz")):
            pytest.skip("committed scene absent")
        images, poses, intr = load_data("synthetic", shape=(32, 32),
                                        root=root)
        assert images.shape[0] == 64
