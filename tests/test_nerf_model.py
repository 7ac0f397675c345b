"""NeRF model-layer tests: network, occupancy grid state, renderer.

Mirrors the intent of the reference's test_nerf.py:12-143 (smoke: every
param gets a gradient; outputs change after an optimizer step), plus unit
tests the reference lacks (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.data.rays import get_rays, rand_poses
from stable_nerf_tpu.models.nerf import (
    OccupancyGridState,
    grid_init,
    mark_untrained_grid,
    nerf_apply,
    nerf_density,
    nerf_init,
    render,
    update_extra_state,
)


def small_cfg(channel_dim=3):
    return NeRFConfig(
        channel_dim=channel_dim,
        grid_size=32,
        encoding_sigma=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                      base_resolution=4),
        )


class TestNetwork:
    def test_apply_shapes_and_ranges(self, key):
        cfg = small_cfg(3)
        params = nerf_init(key, cfg)
        x = jax.random.uniform(key, (64, 3), minval=-1, maxval=1)
        d = jax.random.normal(key, (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sigma, color = nerf_apply(params, x, d, cfg)
        assert sigma.shape == (64,) and color.shape == (64, 3)
        assert sigma.dtype == jnp.float32 and color.dtype == jnp.float32
        assert float(jnp.min(sigma)) >= 0.0              # relu
        assert 0.0 <= float(jnp.min(color)) and float(jnp.max(color)) <= 1.0

    def test_channel_dim_4(self, key):
        cfg = small_cfg(4)
        params = nerf_init(key, cfg)
        x = jnp.zeros((8, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        _, color = nerf_apply(params, x, d, cfg)
        assert color.shape == (8, 4)

    def test_trunc_exp_density_activation(self, key):
        """density_activation='trunc_exp' (torch-ngp nerf/activation.py):
        strictly positive sigma = exp(h), with a gradient that never dies
        (the reference's ReLU choice has a global zero-gradient mode)."""
        cfg = dataclasses.replace(small_cfg(), density_activation="trunc_exp")
        params = nerf_init(key, cfg)
        x = jax.random.uniform(key, (64, 3), minval=-1, maxval=1)
        sigma = nerf_density(params, x, cfg)["sigma"]
        assert float(jnp.min(sigma)) > 0.0               # exp is never 0

        # gradient through sigma is nonzero for EVERY sample (no dead units)
        def f(p):
            return jnp.sum(nerf_density(p, x, cfg)["sigma"])
        g = jax.grad(f)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(t))) for t in jax.tree.leaves(g))
        assert gnorm > 0.0

        # relu default unchanged
        sig_relu = nerf_density(nerf_init(key, small_cfg()), x, small_cfg())["sigma"]
        assert float(jnp.min(sig_relu)) == 0.0 or float(jnp.min(sig_relu)) >= 0.0

    def test_density_consistent_with_apply(self, key):
        cfg = small_cfg()
        params = nerf_init(key, cfg)
        x = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
        sigma_a, _ = nerf_apply(params, x, d, cfg)
        dens = nerf_density(params, x, cfg)
        np.testing.assert_allclose(np.asarray(sigma_a), np.asarray(dens["sigma"]),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_bf16_compute_close_to_f32(self, key):
        cfg = small_cfg()
        params = nerf_init(key, cfg)
        x = jax.random.uniform(key, (32, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
        s32, c32 = nerf_apply(params, x, d, cfg, jnp.float32)
        s16, c16 = nerf_apply(params, x, d, cfg, jnp.bfloat16)
        assert s16.dtype == jnp.float32                  # sigma promoted back
        np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.1)


class TestGrid:
    def test_init(self):
        cfg = small_cfg()
        st = grid_init(cfg)
        assert st.density_grid.shape == (1, 32 ** 3)
        assert st.occ.shape == (1, 32, 32, 32)
        assert not bool(jnp.any(st.occ))

    def test_mark_untrained(self, key):
        cfg = small_cfg()
        st = grid_init(cfg)
        poses = rand_poses(key, 4, radius=2.0)
        st2 = mark_untrained_grid(st, poses, (100.0, 100.0, 32.0, 32.0), cfg)
        n_untrained = int(jnp.sum(st2.density_grid < 0))
        assert 0 < n_untrained < 32 ** 3                 # some but not all
        # cell at the origin is seen by any inward-looking orbit camera
        center_lin = (16 * 32 + 16) * 32 + 16
        assert float(st2.density_grid[0, center_lin]) >= 0

    def test_update_extra_state_full_sweep(self, key):
        cfg = small_cfg()
        st = grid_init(cfg)

        def density_fn(x):
            # unit blob at origin
            return 20.0 * jnp.exp(-jnp.sum(x ** 2, -1) / 0.02)

        st2 = update_extra_state(st, density_fn, key, cfg)
        assert int(st2.iter_density) == 1
        assert bool(jnp.any(st2.occ))
        # occupied cells concentrated near the center
        occ = np.asarray(st2.occ[0])
        idx = np.argwhere(occ)
        assert np.all(np.abs(idx - 15.5) < 8)
        assert float(st2.mean_density) > 0

    def test_update_partial_after_16(self, key):
        cfg = small_cfg()
        st = grid_init(cfg)

        def density_fn(x):
            return 20.0 * jnp.exp(-jnp.sum(x ** 2, -1) / 0.02)

        for i in range(2):
            st = update_extra_state(st, density_fn, jax.random.fold_in(key, i), cfg)
        st = st._replace(iter_density=jnp.int32(20))     # force partial branch
        st2 = update_extra_state(st, density_fn, key, cfg)
        assert bool(jnp.any(st2.occ))
        assert int(st2.iter_density) == 21

    def test_partial_with_empty_grid_no_nan(self, key):
        cfg = small_cfg()
        st = grid_init(cfg)._replace(iter_density=jnp.int32(20))
        st2 = update_extra_state(st, lambda x: jnp.zeros(x.shape[0]), key, cfg)
        assert bool(jnp.all(jnp.isfinite(st2.density_grid)))

    def test_untrained_cells_stay_negative(self, key):
        """−1 cells never re-enter: EMA only touches doubly-valid cells."""
        cfg = small_cfg()
        st = grid_init(cfg)
        grid = st.density_grid.at[0, :100].set(-1.0)
        st = st._replace(density_grid=grid)
        st2 = update_extra_state(st, lambda x: jnp.full(x.shape[0], 5.0), key, cfg)
        assert bool(jnp.all(st2.density_grid[0, :100] == -1.0))
        assert bool(jnp.all(st2.density_grid[0, 100:] > 0))


class TestRenderer:
    def _setup(self, key, channel_dim=3):
        cfg = small_cfg(channel_dim)
        params = nerf_init(key, cfg)
        st = grid_init(cfg)
        # all-occupied grid → dense sampling
        st = st._replace(occ=jnp.ones_like(st.occ))
        poses = rand_poses(key, 1, radius=2.0)
        rays = get_rays(poses, (64.0, 64.0, 16.0, 16.0), 32, 32)
        return cfg, params, st, rays

    def test_render_shapes(self, key):
        cfg, params, st, rays = self._setup(key)
        out = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                     bg_color=1.0, max_steps=64)
        assert out["image"].shape == (1, 1024, 3)
        assert out["depth"].shape == (1, 1024)
        assert out["weights_sum"].shape == (1, 1024)
        assert bool(jnp.all(jnp.isfinite(out["image"])))
        assert bool(jnp.all(out["weights_sum"] >= 0))
        assert bool(jnp.all(out["weights_sum"] <= 1.0 + 1e-5))

    def test_background_blend(self, key):
        """Empty occupancy → image is exactly the background color."""
        cfg, params, st, rays = self._setup(key, channel_dim=4)
        st = st._replace(occ=jnp.zeros_like(st.occ))
        bg = jnp.asarray([1.0, 0.5, 0.25, 0.0])
        out = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                     bg_color=bg, max_steps=64)
        img = np.asarray(out["image"][0])
        np.testing.assert_allclose(img, np.tile(bg, (1024, 1)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["depth"]), 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_every_param_gets_grad_and_step_changes_output(self, key):
        """The reference's smoke test (test_nerf.py:61-76) as a unit test."""
        cfg, params, st, rays = self._setup(key)
        target = jax.random.uniform(key, (1, 1024, 3))

        def loss_fn(p):
            out = render(p, st, rays["rays_o"], rays["rays_d"], cfg,
                         bg_color=0.0, max_steps=64)
            return jnp.mean(jnp.abs(out["image"] - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        leaves = jax.tree.leaves(jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads))
        for leaf in leaves:
            assert float(leaf) > 0, "a parameter received zero gradient"

        opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
        opt_state = opt.init(params)
        updates, _ = opt.update(grads, opt_state)
        params2 = optax.apply_updates(params, updates)
        loss2 = loss_fn(params2)
        assert not np.isclose(float(loss), float(loss2))

    def test_perturb_changes_samples(self, key):
        cfg, params, st, rays = self._setup(key)
        out1 = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                      bg_color=0.0, max_steps=64)
        out2 = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                      bg_color=0.0, max_steps=64, perturb_key=key)
        assert not np.allclose(np.asarray(out1["image"]), np.asarray(out2["image"]))

    def test_eval_max_steps_512_shape(self, key):
        cfg, params, st, rays = self._setup(key, channel_dim=4)
        out = render(params, st, rays["rays_o"][:, :64], rays["rays_d"][:, :64],
                     cfg, bg_color=1.0, max_steps=128)
        assert out["image"].shape == (1, 64, 4)
