#!/usr/bin/env python
"""Standalone NeRF fitting driver.

Equivalent of reference test_nerf.py:146-200 (train_nerf): fit the
occupancy-grid NeRF on the paired dataset's reference views (tiny-NeRF lego
at 128², Adam(1e-2, eps 1e-15), bg 0, max_steps 256) and dump prediction
PNGs to debug_out/.

Usage: python scripts/fit_nerf.py [--dataset nerf] [--data-root datasets]
       [--epochs 100] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="nerf")
    ap.add_argument("--data-root", default="datasets")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--max-steps", type=int, default=256)
    ap.add_argument("--out", default="debug_out")
    ap.add_argument("--grid-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.nerf import (
        grid_init, mark_untrained_grid, nerf_density, nerf_init, render,
        update_extra_state,
    )
    from stable_nerf_tpu.utils.losses import l1_loss, psnr
    from stable_nerf_tpu.utils.visualization import save_image

    H = W = args.size
    cfg = NeRFConfig(channel_dim=3, grid_size=args.grid_size)
    ds = StableNeRFDataset(args.dataset, shape=(H, W), encoded_shape=(H, W),
                           root=args.data_root)
    n = len(ds)
    print(f"{n} views at {H}x{W}")

    key = jax.random.PRNGKey(0)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, ds.intrinsic, cfg)
    )(state, jnp.asarray(ds.reference_poses))

    opt = optax.adam(args.lr, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    images = jnp.asarray(ds.reference_images)           # [N, 3, H, W]
    gts = (images.transpose(0, 2, 3, 1).reshape(n, -1, 3) + 1.0) / 2.0
    rays_o = jnp.asarray(ds.reference_rays["rays_o"])
    rays_d = jnp.asarray(ds.reference_rays["rays_d"])

    @jax.jit
    def train_step(params, opt_state, state, o, d, gt, key):
        def loss_fn(p):
            out = render(p, state, o[None], d[None], cfg, bg_color=0.0,
                         max_steps=args.max_steps, perturb_key=key,
                         compute_dtype=jnp.bfloat16)
            return l1_loss(out["image"][0], gt)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_view(params, state, o, d):
        return render(params, state, o[None], d[None], cfg, bg_color=0.0,
                      max_steps=args.max_steps)["image"][0]

    def density_fn(params):
        return lambda x: nerf_density(params, x, cfg)["sigma"]

    update = jax.jit(lambda s, p, k: update_extra_state(s, density_fn(p), k, cfg))

    os.makedirs(args.out, exist_ok=True)
    for epoch in range(args.epochs):
        key, k_grid = jax.random.split(key)
        state = update(state, params, k_grid)
        total = 0.0
        for i in range(n):
            key, k = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, state, rays_o[i], rays_d[i], gts[i], k)
            total += float(loss)
        if (epoch + 1) % 10 == 0 or epoch == 0:
            pred = eval_view(params, state, rays_o[0], rays_d[0])
            p = float(psnr(pred.reshape(1, H, W, 3).transpose(0, 3, 1, 2),
                           gts[0].reshape(1, H, W, 3).transpose(0, 3, 1, 2))[0, 0])
            print(f"epoch {epoch + 1}: loss {total / n:.6f} view0 PSNR {p:.2f}")
            save_image(os.path.join(args.out, f"pred_{epoch + 1}.png"),
                       np.asarray(pred).reshape(H, W, 3))
            save_image(os.path.join(args.out, "gt.png"),
                       np.asarray(gts[0]).reshape(H, W, 3))


if __name__ == "__main__":
    main()
