#!/usr/bin/env python
"""Pretrain the learned-diffusion demo's tiny VAE on the synthetic scene.

Stage 1 of the offline end-to-end demo (VERDICT r4 next #1): the reference
pipeline conditions and supervises everything in the latent space of a
PRETRAINED frozen VAE (reference stable_diffusion/network.py:21-22); with
real SDXL weights environment-blocked, this script produces the offline
stand-in — a small AutoencoderKL trained to reconstruct the committed
synthetic scene's views, so the joint loop's latents carry actual
view-consistent image structure instead of a random projection.

Training:
  * data: the TRAIN split of the synthetic scene only (same 80/10/10
    split seed as the joint loop), so the demo's held-out novel views
    stay unseen by every learned component;
  * loss: MSE reconstruction + small KL against N(0,1) (the standard
    AutoencoderKL objective at SD's tiny beta);
  * after training, the latent std over the train views is measured and
    1/std stored as the config's scaling_factor — the demo's diffusion
    then runs on ~unit-variance latents, matching the DDIM prior.

Output: an .npz (vae_save_npz) holding params + config + meta
(recon PSNR train/test, latent std), consumed by
``train.py --demo --vae-checkpoint <path>``.

Usage: python scripts/pretrain_tiny_vae.py --out runs/demo_vae/vae.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/demo_vae/vae.npz")
    ap.add_argument("--data-root", default="datasets")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--latent-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stable_nerf_tpu.data.dataset import split_dataset
    from stable_nerf_tpu.data.preprocess import load_data
    from stable_nerf_tpu.models.diffusion.vae import (
        VAEConfig, vae_decode, vae_encode_moments, vae_init, vae_save_npz,
    )
    from stable_nerf_tpu.utils.losses import psnr

    if args.image_size % args.latent_size:
        sys.exit("--image-size must be a multiple of --latent-size")
    factor = args.image_size // args.latent_size
    n_blocks = factor.bit_length()  # factor 2^(n_blocks-1)
    if 2 ** (n_blocks - 1) != factor:
        sys.exit("image/latent ratio must be a power of two")
    cfg = VAEConfig(
        block_out_channels=tuple(32 * 2 ** i for i in range(n_blocks)),
        layers_per_block=1, norm_groups=8, scaling_factor=1.0)
    print(f"VAE: {cfg.block_out_channels} image {args.image_size} -> "
          f"latent {args.latent_size}")

    images, _, _ = load_data("synthetic", shape=(args.image_size,) * 2,
                             root=args.data_root)
    images = np.asarray(images, np.float32)                  # [N,3,H,W] ±1
    tr_idx, va_idx, te_idx = split_dataset(len(images), seed=args.seed)
    train_images = jnp.asarray(images[tr_idx])
    test_images = jnp.asarray(images[te_idx])
    print(f"{len(tr_idx)} train / {len(te_idx)} test views")

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = vae_init(k_init, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{n_params:,} VAE params")

    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps,
                                                 alpha=0.02))
    opt_state = opt.init(params)

    def loss_fn(params, batch, key):
        mean, logvar = vae_encode_moments(params, batch, cfg)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape)
        recon = vae_decode(params, z, cfg)      # scaling_factor=1 round-trip
        rec = jnp.mean((recon - batch) ** 2)
        kl = 0.5 * jnp.mean(jnp.sum(
            mean ** 2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3)))
        return rec + args.kl_weight * kl, (rec, kl)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, (rec, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rec, kl

    @jax.jit
    def eval_recon(params, batch):
        mean, _ = vae_encode_moments(params, batch, cfg)
        recon = vae_decode(params, mean, cfg)
        a = jnp.clip((recon + 1) / 2, 0, 1)
        b = jnp.clip((batch + 1) / 2, 0, 1)
        return psnr(a, b), mean

    t0 = time.perf_counter()
    n_train = train_images.shape[0]
    for step in range(args.steps):
        key, k_idx, k_z = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (args.batch,), 0, n_train)
        batch = train_images[idx]
        params, opt_state, loss, rec, kl = train_step(
            params, opt_state, batch, k_z)
        if step % 500 == 0 or step == args.steps - 1:
            p_tr, _ = eval_recon(params, train_images)
            p_te, _ = eval_recon(params, test_images)
            print(f"step {step}: loss {float(loss):.5f} rec {float(rec):.5f} "
                  f"kl {float(kl):.1f} | recon PSNR train "
                  f"{float(jnp.mean(p_tr)):.2f} test "
                  f"{float(jnp.mean(p_te)):.2f} dB "
                  f"({time.perf_counter() - t0:.0f}s)")

    p_tr, lat_tr = eval_recon(params, train_images)
    p_te, _ = eval_recon(params, test_images)
    latent_std = float(jnp.std(lat_tr))
    latent_mean = float(jnp.mean(lat_tr))
    scaling = 1.0 / latent_std
    meta = {
        "recon_psnr_train": float(jnp.mean(p_tr)),
        "recon_psnr_test": float(jnp.mean(p_te)),
        "latent_std": latent_std,
        "latent_mean": latent_mean,
        "image_size": args.image_size,
        "latent_size": args.latent_size,
        "steps": args.steps,
        "seed": args.seed,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    import dataclasses

    cfg = dataclasses.replace(cfg, scaling_factor=scaling)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    vae_save_npz(args.out, params, cfg, meta=meta)
    print(json.dumps({"artifact": args.out, **meta,
                      "scaling_factor": scaling}))


if __name__ == "__main__":
    main()
