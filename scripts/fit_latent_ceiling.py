#!/usr/bin/env python
"""Attainable-latent-PSNR ceiling for the learning demo (VERDICT r3 #7).

The joint loop's NeRF is supervised toward the NORMALIZED random-VAE
latents of the scene views (joint.forward_iteration to_gt: (lt+1)/2,
reference train.py:52-53,70).  This script measures what latent PSNR a
NeRF *can* reach against exactly that target — the denominator that
turns the demo's "latent_psnr plateaus at X" from an argument into
"X of Y achievable":

  * rebuilds the learning demo's exact VAE (seed-0 key path through
    build_initial_params → sd_network_init → vae_init, frozen partition
    storage-cast bf16 like --frozen-bf16);
  * encodes every dataset view with the deterministic
    ``encode_images_mode`` (the metric's reference signal,
    training/inference.py latent_psnr);
  * overfits the NeRF alone (channel_dim 4, 64² latent rays) on those
    latents with the measured-stable fit recipe (random-ray batches,
    Adam 1e-2 exp-decay, trunc_exp — scripts/fit_nerf.py header);
  * reports mean latent PSNR over views, in the SAME normalized space as
    the (round-4 fixed) latent_psnr metric.

A low ceiling here is the quantitative form of "a random VAE's latents
carry little view-consistent structure"; a high ceiling would instead
indict the joint loop.  Prints a final JSON line.

Usage: python scripts/fit_latent_ceiling.py [--steps 3000] [--views 8]
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
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--rays-per-batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0,
                    help="the learning demo's seed (VAE reconstruction key)")
    ap.add_argument("--sample-budget", type=int, default=2 ** 18)
    ap.add_argument("--update-every", type=int, default=16)
    ap.add_argument("--views", type=int, default=8,
                    help="views for the final PSNR report")
    ap.add_argument("--loss", default="l1", choices=["l1", "mse"],
                    help="l1 = the joint loop's nerf_loss (train.py:70)")
    ap.add_argument("--vae-checkpoint", default=None,
                    help="pretrain_tiny_vae.py artifact: measure the "
                         "ceiling against the TRAINED demo VAE's latents "
                         "(view-consistent structure) instead of the "
                         "random seed-0 VAE — VERDICT r4 next #2.  Uses "
                         "the artifact's image/latent sizes and the "
                         "demo's geometric intrinsics")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import (
        SDNetworkConfig, encode_images_mode,
    )
    from stable_nerf_tpu.models.diffusion.vae import vae_init
    from stable_nerf_tpu.models.nerf import (
        grid_init, mark_untrained_grid, nerf_density, nerf_init, render,
        update_extra_state,
    )
    from stable_nerf_tpu.utils.losses import psnr

    # --- the demo's exact VAE: loop.py derives k_sd from PRNGKey(seed),
    # sd_network_init hands vae_init the first of 4 splits; --frozen-bf16
    # storage-casts it.  Only the VAE subtree is built (the U-Net never
    # touches the NeRF target).
    k_sd, _, _ = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    k_vae = jax.random.split(k_sd, 4)[0]
    sd_cfg = SDNetworkConfig()
    import dataclasses

    from stable_nerf_tpu.config import SDConfig

    scale_intrinsics = False
    if args.vae_checkpoint:
        # the trained demo VAE: f32 storage (it is tiny), demo sizes,
        # geometric intrinsics — the ceiling for the demo's latent_psnr
        from stable_nerf_tpu.models.diffusion.vae import vae_load_npz

        vae_params, vae_cfg, vae_meta = vae_load_npz(args.vae_checkpoint)
        sd_cfg = dataclasses.replace(
            sd_cfg, vae=vae_cfg,
            sd=SDConfig(latent_size=vae_meta.get("latent_size", 16),
                        image_size=vae_meta.get("image_size", 64)))
        scale_intrinsics = True
    else:
        vae_params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                vae_init(k, sd_cfg.vae)))(k_vae)

    enc = sd_cfg.sd.latent_size
    ds = StableNeRFDataset("synthetic", shape=sd_cfg.sd.image_size,
                           encoded_shape=enc,
                           scale_intrinsics=scale_intrinsics)
    n = len(ds)
    images = jnp.asarray(ds.reference_images)            # [N, 3, 512, 512]

    # deterministic mode latents, normalized into the supervised space
    encode = jax.jit(lambda img: encode_images_mode(
        {"vae": vae_params}, img, sd_cfg))
    lts = []
    for i in range(n):                                   # 1 view/call: HBM
        lts.append(encode(images[i:i + 1]))
    target = (jnp.concatenate(lts, 0) + 1.0) / 2.0       # [N, 4, 64, 64]
    t_stats = {"mean": float(target.mean()), "std": float(target.std()),
               "min": float(target.min()), "max": float(target.max())}
    print(f"latent targets: {t_stats}", file=sys.stderr, flush=True)

    cfg = NeRFConfig(channel_dim=4,
                     density_activation=("trunc_exp" if args.vae_checkpoint
                                         else "relu"))
    key = jax.random.PRNGKey(args.seed)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, ds.intrinsic, cfg)
    )(state, jnp.asarray(ds.reference_poses))

    opt = optax.adam(optax.exponential_decay(args.lr, args.steps, 0.1),
                     b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    gts = target.transpose(0, 2, 3, 1).reshape(n, -1, 4)  # [N, 4096, 4]
    rays_o = jnp.asarray(ds.reference_rays["rays_o"])     # [N, 4096, 3]
    rays_d = jnp.asarray(ds.reference_rays["rays_d"])
    pool_o, pool_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    pool_gt = gts.reshape(-1, 4)

    @jax.jit
    def train_step(params, opt_state, state, key):
        k_idx, k_perturb = jax.random.split(key)
        idx = jax.random.randint(k_idx, (args.rays_per_batch,), 0,
                                 pool_o.shape[0])
        o, d, gt = pool_o[idx], pool_d[idx], pool_gt[idx]

        def loss_fn(p):
            out = render(p, state, o[None], d[None], cfg, bg_color=1.0,
                         max_steps=256, perturb_key=k_perturb,
                         compute_dtype=jnp.bfloat16,
                         sample_budget=args.sample_budget)
            err = out["image"][0] - gt
            return (jnp.mean(jnp.abs(err)) if args.loss == "l1"
                    else jnp.mean(err ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # Three eval variants (round 4): the first ceiling run read a uniform
    # 13.6 dB over views at (max_steps 512, budget 2^18) despite train L1
    # 0.007 — a systematic train/eval render mismatch (the budget covers
    # 64 samples/ray; at 512 steps compaction drops a different half of
    # the lattice than the 256-step train render the params adapted to),
    # not a statement about latent capacity.  Separate the effects:
    #   train-matched: 256 steps, train budget (what the fit achieves)
    #   metric-style:  512 steps, same budget (the demo metric's shape)
    #   exact:         512 steps, dense lattice (no compaction at all)
    def make_eval(max_steps, budget):
        @jax.jit
        def eval_view(params, state, o, d):
            return render(params, state, o[None], d[None], cfg,
                          bg_color=1.0, max_steps=max_steps,
                          sample_budget=budget)["image"][0]
        return eval_view

    evals = {
        "train_matched_256": make_eval(256, args.sample_budget),
        "metric_style_512": make_eval(512, args.sample_budget),
        "exact_dense_512": make_eval(512, None),
    }
    eval_view = evals["train_matched_256"]

    def density_fn(p):
        return lambda x: nerf_density(p, x, cfg)["sigma"]

    update = jax.jit(
        lambda s, p, k: update_extra_state(s, density_fn(p), k, cfg))

    def view_psnr(i, fn=None):
        pred = (fn or eval_view)(params, state, rays_o[i], rays_d[i])
        a = pred.reshape(1, enc, enc, 4).transpose(0, 3, 1, 2)
        b = target[i:i + 1]
        return float(psnr(a, b)[0, 0])

    def mean_baseline_psnr(i):
        """The floor any 3D-consistent renderer can trivially reach: a
        constant at the global latent mean.  Per-view random-VAE texture
        is ~iid across views, which a consistent radiance field cannot
        fit — so the achievable ceiling sits near this number, and the
        joint demo's latent_psnr should be read against it."""
        b = target[i:i + 1]
        a = jnp.full_like(b, target.mean())
        return float(psnr(a, b)[0, 0])

    t0 = time.time()
    for step in range(args.steps):
        if step % args.update_every == 0:
            key, k_grid = jax.random.split(key)
            state = update(state, params, k_grid)
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, state, k)
        if (step + 1) % 250 == 0 or step == 0:
            print(f"step {step + 1}: loss {float(loss):.5f} view0 "
                  f"latent_psnr {view_psnr(0):.2f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    nv = min(args.views, n)
    out = {}
    for name, fn in evals.items():
        ps = [view_psnr(i, fn) for i in range(nv)]
        out[name] = {"mean": round(float(np.mean(ps)), 2),
                     "per_view": [round(p, 2) for p in ps]}
    base = [mean_baseline_psnr(i) for i in range(nv)]
    final_loss = float(loss)
    print(json.dumps({
        "ceiling_latent_psnr": out,
        "constant_mean_baseline_psnr": round(float(np.mean(base)), 2),
        "final_l1": round(final_loss, 5),
        "steps": args.steps,
        "target_stats": {k: round(v, 4) for k, v in t_stats.items()},
        "vae": (args.vae_checkpoint or "random seed-0 bf16"),
        "wall_s": round(time.time() - t0, 0),
        "note": ("NeRF-only overfit vs the deterministic latents of the "
                 "named VAE, normalized space — the attainable ceiling "
                 "for the joint demo's latent_psnr, with the "
                 "constant-mean floor as the dynamic-range denominator"),
    }))


if __name__ == "__main__":
    main()
