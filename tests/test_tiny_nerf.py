"""tiny-NeRF end-to-end slice: the model must overfit a synthetic scene.

Establishes the train-loop + PSNR harness of SURVEY.md §7 step 2 without
needing tiny_nerf_data.npz on disk (zero-egress environment): ground truth
comes from an analytic ray-traced sphere."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_nerf_tpu.config import TinyNeRFConfig
from stable_nerf_tpu.data.rays import get_rays, rand_poses
from stable_nerf_tpu.models.nerf.tiny import (
    render_tiny,
    tiny_nerf_apply,
    tiny_nerf_init,
)
from stable_nerf_tpu.utils.losses import psnr


def sphere_gt(rays_o, rays_d, radius=1.0):
    """Analytic render: normal-colored sphere at origin, white background."""
    o, d = np.asarray(rays_o), np.asarray(rays_d)
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p / radius
    color = 0.5 * (n + 1.0)
    return np.where(hit[..., None], color, 1.0).astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(42)
    H = W = 32
    poses = rand_poses(key, 6, radius=4.0)
    rays = get_rays(poses, (32.0, 32.0, W / 2, H / 2), H, W)
    gt = sphere_gt(rays["rays_o"], rays["rays_d"])
    return rays, jnp.asarray(gt)


class TestTinyNeRF:
    cfg = TinyNeRFConfig(n_samples=32, width=64)

    def test_apply_shapes(self, key):
        params = tiny_nerf_init(key, self.cfg)
        x = jax.random.uniform(key, (10, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (10, 1))
        sigma, rgb = tiny_nerf_apply(params, x, d, self.cfg)
        assert sigma.shape == (10,) and rgb.shape == (10, 3)

    def test_render_shapes_and_white_bg(self, key):
        params = tiny_nerf_init(key, self.cfg)
        o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (16, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
        out = render_tiny(params, o, d, self.cfg, white_bg=True)
        assert out["image"].shape == (16, 3)
        assert bool(jnp.all(jnp.isfinite(out["image"])))

    @pytest.mark.slow
    def test_overfit_sphere(self, scene, key):
        """PSNR must climb well above the untrained baseline in ~150 steps —
        the learning-works guarantee the reference gets from visually
        inspecting debug_out renders (test_nerf.py:184-188)."""
        rays, gt = scene
        cfg = self.cfg
        params = tiny_nerf_init(key, cfg)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        o_all = rays["rays_o"].reshape(-1, 3)
        d_all = rays["rays_d"].reshape(-1, 3)
        gt_all = gt.reshape(-1, 3)

        @jax.jit
        def step(params, opt_state, key):
            kb, ks = jax.random.split(key)
            idx = jax.random.randint(kb, (1024,), 0, o_all.shape[0])

            def loss_fn(p):
                out = render_tiny(p, o_all[idx], d_all[idx], cfg, key=ks,
                                  white_bg=True)
                return jnp.mean((out["image"] - gt_all[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_psnr(params):
            out = render_tiny(params, rays["rays_o"][0], rays["rays_d"][0],
                              cfg, white_bg=True)
            return psnr(out["image"][None], gt[0][None])[0, 0]

        psnr0 = float(eval_psnr(params))
        k = key
        for i in range(250):
            k, sk = jax.random.split(k)
            params, opt_state, loss = step(params, opt_state, sk)
        psnr1 = float(eval_psnr(params))

        assert np.isfinite(loss)
        assert psnr1 > psnr0 + 8.0, f"PSNR {psnr0:.2f} → {psnr1:.2f}"
        assert psnr1 > 16.0, f"final PSNR too low: {psnr1:.2f}"
