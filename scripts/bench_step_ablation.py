#!/usr/bin/env python
"""Ablation timing of the NeRF train-step pipeline on real TPU.

Breaks the fwd+bwd render step (bench.py's primary workload: 8192 rays ×
256 steps, 128³ grid, 2^18 budget, bf16) into cumulative stages so the
next optimization target is data, not guesswork:

  march            near/far + masked-lattice march (occupancy gather)
  march+compact    + compact_plan/gather_compact (budget packing)
  +mlp_nohash      + sigma/color MLPs fed by a hash-free dummy encode
  +composite       + composite + bg blend (loss, no grad)
  full fwd         the real forward with hash encode
  full fwd+bwd     the benchmarked number (exact and stochastic)

Usage: python scripts/bench_step_ablation.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _force(out):
    for leaf in jax.tree.leaves(out):
        got = jax.device_get(leaf[(0,) * leaf.ndim])
    return got


def timeit(fn, *args, n=10):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init, render
    from stable_nerf_tpu.models.nerf.network import _mlp_apply, nerf_color
    from stable_nerf_tpu.ops.compaction import (
        compact_plan, gather_compact, scatter_back,
    )
    from stable_nerf_tpu.ops.composite import composite_rays
    from stable_nerf_tpu.ops.marching import march_rays_lattice
    from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb

    key = jax.random.PRNGKey(0)
    cfg = NeRFConfig(channel_dim=4)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    state = state._replace(occ=jnp.ones_like(state.occ))
    rays = get_rays(rand_poses(key, 2, radius=2.0), (138.0, 138.0, 32, 32),
                    64, 64)
    o = rays["rays_o"].reshape(-1, 3)
    d = rays["rays_d"].reshape(-1, 3)
    budget = 2 ** 18
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    @jax.jit
    def stage_march(o, d, k):
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        noise = jax.random.uniform(k, (o.shape[0],))
        pos, ts, dt, valid, t0 = march_rays_lattice(
            o, d, nears, fars, state.occ, bound=cfg.bound,
            cascade=cfg.cascade, grid_size=cfg.grid_size, max_steps=256,
            noise=noise)
        return pos, valid

    @jax.jit
    def stage_compact(o, d, k):
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        noise = jax.random.uniform(k, (o.shape[0],))
        pos, ts, dt, valid, t0 = march_rays_lattice(
            o, d, nears, fars, state.occ, bound=cfg.bound,
            cascade=cfg.cascade, grid_size=cfg.grid_size, max_steps=256,
            noise=noise)
        plan = compact_plan(valid, budget)
        pos_c = gather_compact(plan, pos)
        return pos_c, plan.new_valid

    @jax.jit
    def stage_mlp_nohash(o, d, k):
        pos_c, _ = stage_compact(o, d, k)
        # hash-free dummy encode: fixed linear lift to the encoder width
        h = jnp.tile(pos_c, (1, 11))[:, :32].astype(jnp.bfloat16)
        h = _mlp_apply(params.sigma_mlp, h, jnp.bfloat16)
        sigma = jax.nn.relu(h[..., 0]).astype(jnp.float32)
        dirs_c = jnp.zeros_like(pos_c)
        color = nerf_color(params, dirs_c, h[..., 1:], cfg, jnp.bfloat16)
        return sigma, color

    def full_loss(p, o, d, k, cfg_used):
        out = render(p, state, o, d, cfg_used, bg_color=1.0, max_steps=256,
                     perturb_key=k, compute_dtype=jnp.bfloat16,
                     sample_budget=budget)
        return jnp.mean(jnp.abs(out["image"] - 0.5))

    fwd_exact = jax.jit(lambda p, k: full_loss(p, o, d, k, cfg))
    grad_exact = jax.jit(jax.grad(lambda p, k: full_loss(p, o, d, k, cfg)))
    cfg_s = NeRFConfig(channel_dim=4, hash_stochastic=True)
    fwd_stoch = jax.jit(lambda p, k: full_loss(p, o, d, k, cfg_s))
    grad_stoch = jax.jit(jax.grad(lambda p, k: full_loss(p, o, d, k, cfg_s)))

    k = jax.random.fold_in(key, 1)
    print(f"march:                {timeit(stage_march, o, d, k):8.1f} ms")
    print(f"march+compact:        {timeit(stage_compact, o, d, k):8.1f} ms")
    print(f"+mlps (no hash):      {timeit(stage_mlp_nohash, o, d, k):8.1f} ms")
    print(f"full fwd (exact):     {timeit(fwd_exact, params, k):8.1f} ms")
    print(f"full fwd (stoch):     {timeit(fwd_stoch, params, k):8.1f} ms")
    print(f"full fwd+bwd (exact): {timeit(grad_exact, params, k):8.1f} ms")
    print(f"full fwd+bwd (stoch): {timeit(grad_stoch, params, k):8.1f} ms")


if __name__ == "__main__":
    main()
