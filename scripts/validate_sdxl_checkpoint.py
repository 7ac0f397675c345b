#!/usr/bin/env python
"""Validate a real SDXL checkpoint end-to-end through the JAX stack.

The zero-egress build environment has no SDXL weights on disk, so the HF
weight converters (stable_nerf_tpu/models/diffusion/weights.py) are
roundtrip-tested against randomly initialized torch models only.  This
script is the missing last mile: point it at a real checkpoint directory
(HF hub layout: vae/, unet/, text_encoder/, text_encoder_2/) and it runs
the reference's visual-parity workloads (test_sd.py:23-168):

  1. load + per-subtree parameter checksums (leaf count, L2 norm, SHA256
     of concatenated f32 bytes) — so two machines can compare loads;
  2. VAE round-trip: encode→decode a deterministic test image, report
     latent stats and reconstruction PSNR (reference test_sd.py:31-101);
  3. empty-prompt conditioning: build the cached SDXL embeds from the
     CLIP towers (reference network.py:114-168) and assert non-zero,
     finite, with printed norms;
  4. 50-step DDIM denoise from pure noise with empty-prompt conditioning
     (reference test_sd.py:104-168), saving the decoded image.

Usage:
  python scripts/validate_sdxl_checkpoint.py --checkpoint /path/to/sdxl
      [--skip-denoise] [--out debug_out/sdxl]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tree_checksum(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    h = hashlib.sha256()
    total, sq = 0, 0.0
    for leaf in leaves:
        arr = np.asarray(leaf, np.float32)
        h.update(arr.tobytes())
        total += arr.size
        sq += float((arr.astype(np.float64) ** 2).sum())
    return {"leaves": len(leaves), "params": total,
            "l2": round(float(np.sqrt(sq)), 4), "sha256": h.hexdigest()[:16]}


def test_image(size: int = 512) -> np.ndarray:
    """Deterministic smooth test card in [-1, 1], [1, 3, H, W]."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = np.sin(6.28 * x) * np.cos(3.14 * y)
    g = np.clip(2 * ((x - 0.5) ** 2 + (y - 0.5) ** 2) ** 0.5, 0, 1) * 2 - 1
    b = np.sin(12.56 * (x + y)) * 0.5
    return np.stack([r, g, b])[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", default="debug_out/sdxl")
    ap.add_argument("--skip-denoise", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stable_nerf_tpu.config import SchedulerConfig
    from stable_nerf_tpu.models.diffusion import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.unet import sdxl_unet_config, unet_apply
    from stable_nerf_tpu.models.diffusion.vae import (
        VAEConfig, vae_decode, vae_encode_sample,
    )
    from stable_nerf_tpu.models.diffusion.weights import load_sdxl
    from stable_nerf_tpu.utils.losses import psnr

    os.makedirs(args.out, exist_ok=True)
    report = {}

    # -- 1. load + checksums ------------------------------------------
    print(f"loading {args.checkpoint} …")
    params = load_sdxl(args.checkpoint)
    for name in sorted(params):
        cs = tree_checksum(params[name])
        report[f"checksum/{name}"] = cs
        print(f"  {name}: {cs}")

    vae_cfg = VAEConfig()                  # defaults are the SDXL config
    unet_cfg = sdxl_unet_config()

    # -- 2. VAE round-trip --------------------------------------------
    img = jnp.asarray(test_image())
    key = jax.random.PRNGKey(0)

    @jax.jit
    def roundtrip(vae_params, img, key):
        # scaling_factor applied inside encode / removed inside decode
        lat = vae_encode_sample(vae_params, img, key, vae_cfg)
        rec = vae_decode(vae_params, lat, vae_cfg)
        return lat, rec

    lat, rec = jax.block_until_ready(roundtrip(params["vae"], img, key))
    rec_psnr = float(psnr(
        jnp.clip((rec + 1) / 2, 0, 1), jnp.clip((img + 1) / 2, 0, 1))[0, 0])
    report["vae"] = {
        "latent_shape": list(lat.shape),
        "latent_mean": round(float(lat.mean()), 4),
        "latent_std": round(float(lat.std()), 4),
        "reconstruction_psnr_db": round(rec_psnr, 2),
    }
    print(f"VAE roundtrip: latent std {report['vae']['latent_std']}, "
          f"reconstruction PSNR {rec_psnr:.2f} dB")
    assert np.isfinite(rec_psnr) and rec_psnr > 20.0, (
        "VAE reconstruction is broken — check converter key mapping")

    # -- 3. empty-prompt conditioning ---------------------------------
    if "text_encoder" in params and "text_encoder_2" in params:
        from stable_nerf_tpu.models.diffusion.clip_text import (
            make_empty_prompt_conditioning,
        )

        embeds, pooled, time_ids = jax.jit(make_empty_prompt_conditioning)(
            params["text_encoder"], params["text_encoder_2"])
        report["empty_prompt"] = {
            "embeds_norm": round(float(jnp.linalg.norm(embeds)), 4),
            "pooled_norm": round(float(jnp.linalg.norm(pooled)), 4),
        }
        print(f"empty-prompt conditioning: {report['empty_prompt']}")
        assert float(jnp.linalg.norm(pooled)) > 0, "pooled embeds are zero"
        assert bool(jnp.all(jnp.isfinite(embeds)))
    else:
        pooled = jnp.zeros((1, unet_cfg.pooled_projection_dim))
        report["empty_prompt"] = "text encoders missing — zeros fallback"
        print("WARNING: no text_encoder dirs; skipping conditioning check")

    # -- 4. 50-step DDIM denoise --------------------------------------
    if not args.skip_denoise:
        scheduler = DDIMScheduler.create(SchedulerConfig())
        B, H = 1, 64
        bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params["unet"])
        ip_tokens = jnp.zeros((B, 4, unet_cfg.cross_attention_dim),
                              jnp.bfloat16)
        time_ids = jnp.broadcast_to(
            jnp.asarray([[1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]]), (B, 6))
        ts = jnp.asarray(scheduler.timesteps(args.steps))
        latents = jax.random.normal(key, (B, 4, H, H))

        @jax.jit
        def denoise(unet_params, pooled, latents):
            def body(x, t):
                eps = unet_apply(unet_params, x, t, ip_tokens,
                                 added_text_embeds=pooled[:B],
                                 added_time_ids=time_ids, cfg=unet_cfg,
                                 compute_dtype=jnp.bfloat16)
                x, _ = scheduler.step(eps, t, x,
                                      num_inference_steps=args.steps)
                return x, None
            out, _ = jax.lax.scan(body, latents, ts)
            return out

        print(f"{args.steps}-step DDIM denoise …")
        final = jax.block_until_ready(denoise(bf16, pooled, latents))
        image = vae_decode(params["vae"], final, vae_cfg)
        arr = np.asarray(jnp.clip((image + 1) / 2, 0, 1)[0].transpose(1, 2, 0))
        report["denoise"] = {
            "latent_std": round(float(final.std()), 4),
            "image_mean": round(float(arr.mean()), 4),
            "image_std": round(float(arr.std()), 4),
            "finite": bool(np.all(np.isfinite(arr))),
        }
        print(f"denoise: {report['denoise']}")
        assert report["denoise"]["finite"], "non-finite denoise output"
        assert report["denoise"]["image_std"] > 0.01, (
            "denoised image is flat — conditioning or scheduler broken")
        try:
            from stable_nerf_tpu.utils.visualization import save_image
            save_image(os.path.join(args.out, "denoised.png"), arr)
        except Exception as e:
            print(f"(image save skipped: {e})")

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nALL CHECKS PASSED — report at {args.out}/report.json")


if __name__ == "__main__":
    main()
