#!/usr/bin/env python
"""Standalone Stable-Diffusion driver: VAE round-trip + full DDIM denoise.

Equivalent of reference test_sd.py (test_vae/test_image_reconstruction at
:23-101, test_sd_denoise at :104-168): encode an image through the VAE,
report latent statistics, reconstruct, and run a 50-step empty-prompt DDIM
denoise producing an image.

Without --sdxl-checkpoint this runs the full-architecture models with random
weights (zero-egress environment) — exercising the exact compute path; with
a checkpoint directory it reproduces the reference's visual outputs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None, help="input image (default: noise)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sdxl-checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true", help="tiny configs")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel axis size for the denoise "
                         "(ring attention over latent tokens; needs sp*tp "
                         "local devices)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel axis size for the denoise "
                         "(attention-head/GEGLU sharding)")
    ap.add_argument("--out", default="debug_out_sd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stable_nerf_tpu.config import SDConfig
    from stable_nerf_tpu.models.diffusion import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.sd_network import (
        SDNetworkConfig, decode_latents, encode_images, sd_forward,
        sd_network_init, init_ip_from_unet,
    )
    from stable_nerf_tpu.utils.visualization import save_image

    if args.tiny:
        from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
        from stable_nerf_tpu.models.diffusion.vae import VAEConfig

        size = min(args.size, 64)
        cfg = SDNetworkConfig(
            sd=SDConfig(cross_attention_dim=48, latent_size=size // 2,
                        image_size=size),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        )
    else:
        size = args.size
        cfg = SDNetworkConfig(sd=SDConfig(image_size=size))

    key = jax.random.PRNGKey(0)
    params = sd_network_init(key, cfg)
    if args.sdxl_checkpoint:
        from stable_nerf_tpu.models.diffusion.weights import load_sdxl

        params.update(load_sdxl(args.sdxl_checkpoint, unet_cfg=cfg.unet,
                                vae_cfg=cfg.vae))
    params = init_ip_from_unet(params)
    scheduler = DDIMScheduler.create(cfg.scheduler)

    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((size, size))
        x = np.asarray(img, np.float32) / 127.5 - 1.0
        x = jnp.asarray(x.transpose(2, 0, 1))[None]
    else:
        x = jax.random.uniform(key, (1, 3, size, size), minval=-1, maxval=1)

    os.makedirs(args.out, exist_ok=True)

    # 1. VAE round trip (reference test_sd.py:23-101)
    lat = encode_images(params, x, key, cfg)
    print(f"latents: shape {lat.shape} mean {float(lat.mean()):.4f} "
          f"std {float(lat.std()):.4f} min {float(lat.min()):.3f} "
          f"max {float(lat.max()):.3f}")
    recon = decode_latents(params, lat, cfg)
    err = float(jnp.mean((recon - x) ** 2))
    print(f"VAE reconstruction MSE: {err:.5f}")
    save_image(os.path.join(args.out, "vae_recon.png"),
               np.asarray(jnp.clip((recon[0] + 1) / 2, 0, 1)), chw=True)

    # 2. full DDIM denoise with empty-prompt/zero conditioning
    #    (reference test_sd.py:104-168; conditioning tokens here come from
    #    zeroed ip-condition images through the projection path)
    enc = cfg.sd.latent_size
    cond = jnp.zeros((2, cfg.sd.cond_channels, enc, enc))
    latents = jax.random.normal(key, lat.shape)
    ts = jnp.asarray(scheduler.timesteps(args.steps))

    if args.sp > 1 or args.tp > 1:
        # sequence-/tensor-parallel serving: the whole denoise scan runs
        # under shard_map on a (data=1 × seq × model) mesh — U-Net heads
        # shard over `model`, latent tokens over `seq` (ring attention);
        # the conditioning path and scheduler stay replicated.
        from stable_nerf_tpu.parallel import make_mesh_3d
        from stable_nerf_tpu.parallel.sp import serving_param_specs

        n_needed = args.sp * args.tp
        if jax.device_count() < n_needed:
            sys.exit(f"--sp {args.sp} --tp {args.tp} needs {n_needed} "
                     f"devices, have {jax.device_count()}")
        mesh = make_mesh_3d(n_needed, sp=args.sp, tp=args.tp)
        tp_axis = "model" if args.tp > 1 else None
        sp_axis = "seq" if args.sp > 1 else None
        params, pspecs = serving_param_specs(params, args.tp,
                                             unet_keys=("unet",))
        print(f"denoising under shard_map: seq={args.sp} model={args.tp}")
    else:
        mesh = tp_axis = sp_axis = None
        pspecs = None

    # one denoise body for both paths (tp/sp axes are None single-device)
    def denoise_local(params, latents):
        def body(x, t):
            eps = sd_forward(params, x, t, cond, cfg,
                             compute_dtype=jnp.bfloat16,
                             tp_axis=tp_axis, sp_axis=sp_axis)
            x, _ = scheduler.step(eps, t, x, num_inference_steps=args.steps)
            return x, None
        out, _ = jax.lax.scan(body, latents, ts)
        return out

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        mapped = jax.shard_map(denoise_local, mesh=mesh,
                               in_specs=(pspecs, P()), out_specs=P(),
                               check_vma=False)
        jitted = jax.jit(mapped)
    else:
        jitted = jax.jit(denoise_local)
    denoise = lambda latents: jitted(params, latents)

    import time

    t0 = time.time()
    latents = jax.block_until_ready(denoise(latents))
    dt = time.time() - t0
    print(f"{args.steps}-step DDIM denoise: {dt:.1f}s "
          f"({args.steps / dt:.2f} steps/s incl. compile)")
    t0 = time.time()
    latents2 = jax.block_until_ready(denoise(latents))
    dt = time.time() - t0
    print(f"steady-state: {args.steps / dt:.2f} denoise steps/s")

    img = decode_latents(params, latents.astype(jnp.float32), cfg)
    save_image(os.path.join(args.out, "denoised.png"),
               np.asarray(jnp.clip((img[0] + 1) / 2, 0, 1)), chw=True)
    print(f"outputs written to {args.out}/")


if __name__ == "__main__":
    main()
