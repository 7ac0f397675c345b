#!/usr/bin/env python
"""Ablation timing of the EVAL render path on real TPU.

bench.py measures nerf_eval_ms_per_image ≈ 249 ms for one 64² latent
image (4096 rays × 512 lattice steps, 64-samples/ray budget) — ~5× the
arithmetic estimate for 262k forward-only NeRF samples.  Cumulative
stages isolate where the time goes:

  march512          near/far + 512-step masked-lattice march
  +compact          + compact_plan + pos/dirs gather (2.1M → 262k)
  +eval             + hash encode + MLPs on the 262k compacted samples
  +scatter_back     + scatter sigma/rgb back to the [4096, 512] lattice
  full render       the benchmarked eval path (adds composite + blend)

Usage: python scripts/bench_eval_ablation.py
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


def timeit(fn, *args, n=5):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import (
        grid_init, mark_untrained_grid, nerf_density, nerf_init, render,
        update_extra_state,
    )
    from stable_nerf_tpu.models.nerf.renderer import _eval_samples
    from stable_nerf_tpu.ops.compaction import (
        compact_plan, gather_compact, scatter_back,
    )
    from stable_nerf_tpu.ops.marching import march_rays_lattice
    from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb

    key = jax.random.PRNGKey(0)
    cfg = NeRFConfig(channel_dim=4)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    poses = rand_poses(key, 1, radius=2.0)
    rays = get_rays(poses, (138.0, 138.0, 32, 32), 64, 64)
    state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, (138.0, 138.0, 32, 32), cfg)
    )(state, poses)

    @jax.jit
    def refresh(state, params, k):
        dens = lambda x: nerf_density(params, x, cfg)["sigma"]
        return update_extra_state(state, dens, k, cfg)

    state = jax.block_until_ready(refresh(state, params, key))
    occ_frac = float(jax.device_get(state.occ.mean()))
    print(f"occ fraction: {occ_frac:.3f}")

    o = rays["rays_o"].reshape(-1, 3)
    d = rays["rays_d"].reshape(-1, 3)
    budget = 64 * 4096
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    def march(o, d):
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        pos, ts, dt, valid, t0 = march_rays_lattice(
            o, d, nears, fars, state.occ, bound=cfg.bound,
            cascade=cfg.cascade, grid_size=cfg.grid_size, max_steps=512)
        return pos, ts, dt, valid, t0, nears, fars

    @jax.jit
    def stage_march(o, d):
        pos, ts, dt, valid, *_ = march(o, d)
        return pos, valid

    @jax.jit
    def stage_compact(o, d):
        pos, ts, dt, valid, *_ = march(o, d)
        N, K = valid.shape
        plan = compact_plan(valid, budget)
        ray_of = jnp.minimum(plan.src_idx // K, N - 1)
        dirs_c = d[ray_of] * plan.slot_used[:, None].astype(d.dtype)
        return gather_compact(plan, pos), dirs_c

    @jax.jit
    def stage_eval(o, d):
        pos_c, dirs_c = stage_compact(o, d)
        return _eval_samples(params, pos_c, dirs_c, cfg, jnp.bfloat16,
                             2 ** 17)

    @jax.jit
    def stage_scatter_back(o, d):
        pos, ts, dt, valid, *_ = march(o, d)
        N, K = valid.shape
        plan = compact_plan(valid, budget)
        ray_of = jnp.minimum(plan.src_idx // K, N - 1)
        dirs_c = d[ray_of] * plan.slot_used[:, None].astype(d.dtype)
        sig_c, rgb_c = _eval_samples(params, gather_compact(plan, pos),
                                     dirs_c, cfg, jnp.bfloat16, 2 ** 17)
        M = N * K
        sig = scatter_back(plan, sig_c, M).reshape(N, K)
        rgb = scatter_back(plan, rgb_c, M).reshape(N, K, cfg.channel_dim)
        return sig, rgb

    @jax.jit
    def full(o, d):
        return render(params, state, o, d, cfg, bg_color=1.0, max_steps=512,
                      compute_dtype=jnp.bfloat16, sample_budget=budget)

    print(f"march512:        {timeit(stage_march, o, d):8.1f} ms")
    print(f"+compact:        {timeit(stage_compact, o, d):8.1f} ms")
    print(f"+eval:           {timeit(stage_eval, o, d):8.1f} ms")
    print(f"+scatter_back:   {timeit(stage_scatter_back, o, d):8.1f} ms")
    print(f"full render:     {timeit(full, o, d):8.1f} ms")


if __name__ == "__main__":
    main()
