"""End-to-end render vs a pure-python volume-rendering oracle.

Ties the per-op oracles together: march (lattice) + network eval +
composite + background blend through the public `render()` must equal a
NumPy transcription of the reference's full run_cuda pipeline
(renderer.py:70-116) on a small scene."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.data.rays import get_rays, rand_poses
from stable_nerf_tpu.models.nerf import grid_init, nerf_apply, nerf_init, render
from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb


def oracle_render(params, occ, o, d, cfg, max_steps, bg, t_thresh=1e-4):
    """NumPy loop: uniform lattice march + occupancy mask + front-to-back
    compositing + bg blend + depth normalize."""
    o_np, d_np = np.asarray(o), np.asarray(d)
    N = o_np.shape[0]
    H = cfg.grid_size
    dt = 2 * np.sqrt(3) / max_steps
    aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
    nears, fars = np.asarray(nears), np.asarray(fars)
    occ_np = np.asarray(occ)

    images = np.zeros((N, cfg.channel_dim), np.float32)
    ws_out = np.zeros(N, np.float32)
    depth_out = np.zeros(N, np.float32)
    for r in range(N):
        t0 = nears[r]
        T, ws, dep = 1.0, 0.0, 0.0
        acc = np.zeros(cfg.channel_dim, np.float32)
        for k in range(max_steps):
            t = t0 + k * dt
            if t >= fars[r]:
                break
            pos = np.clip(o_np[r] + t * d_np[r], -cfg.bound, cfg.bound)
            cell = np.clip((0.5 * (pos / cfg.bound + 1) * H).astype(int), 0, H - 1)
            if not occ_np[0, cell[0], cell[1], cell[2]]:
                continue
            sigma, rgb = nerf_apply(
                params, jnp.asarray(pos)[None], jnp.asarray(d_np[r])[None], cfg
            )
            sigma = float(sigma[0]) * cfg.density_scale
            alpha = 1.0 - np.exp(-sigma * dt)
            w = alpha * T
            acc += w * np.asarray(rgb[0])
            dep += w * (t + dt - t0)
            ws += w
            T *= 1.0 - alpha
            if T < t_thresh:
                break
        img = acc + (1.0 - ws) * bg
        span = fars[r] - nears[r]
        images[r] = img
        ws_out[r] = ws
        depth_out[r] = max(dep - nears[r], 0) / span if span > 0 else 0.0
    return images, ws_out, depth_out


@pytest.mark.slow
def test_render_matches_oracle(key):
    cfg = NeRFConfig(
        channel_dim=3, grid_size=16,
        encoding_sigma=HashGridConfig(n_levels=3, log2_hashmap_size=10,
                                      base_resolution=4),
    )
    params = nerf_init(key, cfg)
    st = grid_init(cfg)
    rng = np.random.default_rng(3)
    occ = jnp.asarray(rng.uniform(size=(1, 16, 16, 16)) < 0.5)
    st = st._replace(occ=occ)

    poses = rand_poses(key, 1, radius=2.0)
    rays = get_rays(poses, (16.0, 16.0, 4.0, 4.0), 8, 8)   # 64 rays
    o = rays["rays_o"][0]
    d = rays["rays_d"][0]
    max_steps = 24

    out = render(params, st, o[None], d[None], cfg, bg_color=0.7,
                 max_steps=max_steps)
    img_o, ws_o, dep_o = oracle_render(params, occ, o, d, cfg, max_steps, 0.7)

    np.testing.assert_allclose(np.asarray(out["image"][0]), img_o,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["weights_sum"][0]), ws_o,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"][0]), dep_o,
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_render_budget_matches_oracle(key):
    """Same scene through the compaction path."""
    cfg = NeRFConfig(
        channel_dim=3, grid_size=16,
        encoding_sigma=HashGridConfig(n_levels=3, log2_hashmap_size=10,
                                      base_resolution=4),
    )
    params = nerf_init(key, cfg)
    st = grid_init(cfg)
    rng = np.random.default_rng(4)
    occ = jnp.asarray(rng.uniform(size=(1, 16, 16, 16)) < 0.4)
    st = st._replace(occ=occ)
    poses = rand_poses(key, 1, radius=2.0)
    rays = get_rays(poses, (16.0, 16.0, 4.0, 4.0), 8, 8)
    o, d = rays["rays_o"][0], rays["rays_d"][0]

    out = render(params, st, o[None], d[None], cfg, bg_color=1.0,
                 max_steps=24, sample_budget=64 * 24 - 1)
    img_o, ws_o, _ = oracle_render(params, occ, o, d, cfg, 24, 1.0)
    np.testing.assert_allclose(np.asarray(out["image"][0]), img_o,
                               rtol=1e-3, atol=2e-4)
