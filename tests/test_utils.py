"""Loss/metric and ray-generation utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.data.rays import get_rays, nerf_matrix_to_ngp, rand_poses
from stable_nerf_tpu.utils.losses import l1_loss, l2_loss, mse, psnr, ssim


class TestLosses:
    def test_l1_l2(self):
        a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        b = jnp.zeros((2, 2))
        assert np.isclose(float(l1_loss(a, b)), 2.5)
        assert np.isclose(float(l2_loss(a, b)), 7.5)

    def test_psnr_identity(self):
        img = jnp.full((2, 3, 8, 8), 0.5)
        assert np.all(np.asarray(psnr(img, img)) == np.inf)

    def test_psnr_known_value(self):
        a = jnp.zeros((1, 3, 4, 4))
        b = jnp.full((1, 3, 4, 4), 0.1)
        # mse = 0.01 → psnr = 20*log10(1/0.1) = 20
        np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, rtol=1e-5)

    def test_ssim_identity_and_range(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
        assert float(ssim(img, img)) > 0.999
        noise = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
        v = float(ssim(img, noise))
        assert -1.0 <= v < 0.9


class TestGetRays:
    def test_full_image(self, key):
        poses = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
        out = get_rays(poses, (100.0, 100.0, 32.0, 32.0), 64, 64)
        assert out["rays_o"].shape == (2, 64 * 64, 3)
        assert out["rays_d"].shape == (2, 64 * 64, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["rays_d"]), axis=-1), 1.0, rtol=1e-5
        )
        # identity pose → central pixel looks along +z
        cidx = 32 * 64 + 32
        d = np.asarray(out["rays_d"][0, cidx])
        assert d[2] > 0.99

    def test_principal_point_pixel(self):
        """Pixel (cx-0.5, cy-0.5) has direction exactly +z for identity pose."""
        poses = jnp.eye(4)[None]
        fx, fy, cx, cy = 100.0, 100.0, 8.5, 8.5
        out = get_rays(poses, (fx, fy, cx, cy), 16, 16)
        inds = np.asarray(out["inds"][0])
        i = inds.reshape(16, 16)
        d = np.asarray(out["rays_d"][0]).reshape(16, 16, 3)
        np.testing.assert_allclose(d[8, 8], [0, 0, 1], atol=1e-6)

    def test_sampled(self, key):
        poses = jnp.tile(jnp.eye(4)[None], (1, 1, 1))
        out = get_rays(poses, (100.0, 100.0, 32.0, 32.0), 64, 64, N=128, key=key)
        assert out["rays_o"].shape == (1, 128, 3)
        assert out["inds"].shape == (1, 128)
        assert int(jnp.max(out["inds"])) < 64 * 64

    def test_patch_sampling(self, key):
        poses = jnp.eye(4)[None]
        out = get_rays(poses, (100.0, 100.0, 32.0, 32.0), 64, 64, N=64, key=key,
                       patch_size=4)
        assert out["rays_o"].shape[1] == 64  # 4 patches × 16

    def test_rotation_applied(self, key):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]])  # +z→... rotate
        out = get_rays(jnp.asarray(pose)[None], (1e6, 1e6, 8.0, 8.0), 16, 16)
        # huge focal → all dirs ≈ camera z-axis rotated = first column? dirs@R^T
        d = np.asarray(out["rays_d"][0, 0])
        np.testing.assert_allclose(d, pose[:3, :3] @ np.array([0, 0, 1]), atol=1e-3)


class TestPoses:
    def test_rand_poses_orbit(self, key):
        poses = rand_poses(key, 16, radius=5.0)
        assert poses.shape == (16, 4, 4)
        centers = np.asarray(poses[:, :3, 3])
        np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 5.0, rtol=1e-5)
        # rotation columns orthonormal, forward points at origin
        R = np.asarray(poses[:, :3, :3])
        eye = np.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        fwd = R[:, :, 2]
        np.testing.assert_allclose(fwd, -centers / 5.0, atol=1e-5)

    def test_ngp_transform(self):
        pose = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = nerf_matrix_to_ngp(pose, scale=0.33)
        # row order (1, 2, 0), cols 1,2 negated, translation scaled
        np.testing.assert_allclose(out[0], [4, -5, -6, 7 * 0.33], rtol=1e-6)
        np.testing.assert_allclose(out[1], [8, -9, -10, 11 * 0.33], rtol=1e-6)
        np.testing.assert_allclose(out[2], [0, -1, -2, 3 * 0.33], rtol=1e-6)
        np.testing.assert_allclose(out[3], [0, 0, 0, 1])
