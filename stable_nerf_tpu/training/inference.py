"""Full DDIM-sampling inference: NeRF-conditioned novel-view generation.

Functional equivalent of reference train.py:323-432 (inference()):
per test batch, encode the reference image with the VAE, render the target
view's latent with the NeRF (max_steps 512), assemble the two 7-channel
conditions, then run a 50-step eta=0 DDIM denoise from pure noise and decode.

Reference quirks reproduced:
  * the NeRF latent is NOT renormalized ×2−1 here, unlike training
    (train.py:371 vs :75) — kept as-is for parity;
  * no classifier-free guidance (the CFG code is commented out in the
    reference, train.py:396-402).

The whole 50-step loop is one jitted lax.scan — no per-step host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.diffusion.scheduler import DDIMScheduler
from ..models.diffusion.sd_network import decode_latents, encode_images, sd_forward
from ..models.nerf.renderer import render
from ..utils.losses import l2_loss, psnr, ssim
from .joint import JointConfig, eval_sample_budget


def make_inference_step(
    cfg: JointConfig,
    scheduler: DDIMScheduler,
    num_steps: int = 50,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Build the jitted per-batch inference function.

    Returns fn(params, grid_state, batch, key) → dict with the denoised
    novel view plus PSNR/SSIM/L2 metrics against the GT target image.
    """
    ts = scheduler.timesteps(num_steps)

    def step(params, grid_state, batch, key):
        enc = cfg.latent_hw
        C = cfg.nerf.channel_dim
        k_vae, k_init = jax.random.split(key)

        target_image = batch["target_image"]
        reference_image = batch["reference_image"]
        B = target_image.shape[0]

        # cond 1: VAE latent of the reference view (train.py:363)
        reference_lt = encode_images(params["sd"], reference_image, k_vae, cfg.sd)

        # cond 2: NeRF-rendered target latent, eval config (train.py:369)
        out = render(
            params["nerf"], grid_state,
            batch["target_rays_o"], batch["target_rays_d"], cfg.nerf,
            bg_color=cfg.train.bg_color, max_steps=cfg.train.max_steps_eval,
            compute_dtype=compute_dtype,
            sample_budget=eval_sample_budget(
                B * enc * enc, cfg.train),
        )
        # NOT ×2−1 (reference train.py:371 quirk)
        pred_target_lt = out["image"].reshape(B, enc, enc, C).transpose(0, 3, 1, 2)

        t_dirs = batch["target_rays_d"].transpose(0, 2, 1).reshape(B, 3, enc, enc)
        r_dirs = batch["reference_rays_d"].transpose(0, 2, 1).reshape(B, 3, enc, enc)
        image_embeds = jnp.concatenate([
            jnp.concatenate([pred_target_lt, t_dirs], axis=1),
            jnp.concatenate([reference_lt, r_dirs], axis=1),
        ], axis=0)

        # 50-step DDIM from pure noise (train.py:381-404)
        latents = jax.random.normal(k_init, reference_lt.shape)

        def body(x, t):
            eps = sd_forward(params["sd"], x, t, image_embeds, cfg.sd,
                             compute_dtype=compute_dtype)
            x, _ = scheduler.step(eps, t, x, num_inference_steps=num_steps)
            return x, None

        latents, _ = jax.lax.scan(body, latents, jnp.asarray(ts))

        decoded = decode_latents(params["sd"], latents.astype(jnp.float32), cfg.sd)
        pred = jnp.clip((decoded + 1.0) / 2.0, 0.0, 1.0)       # train.py:408
        gt = jnp.clip((target_image + 1.0) / 2.0, 0.0, 1.0)

        return {
            "denoised_image": pred,
            "target_image": gt,
            "reference_image": jnp.clip((reference_image + 1) / 2, 0, 1),
            "pred_target_latent": pred_target_lt,
            "l2_loss": l2_loss(pred, gt),
            "psnr": psnr(pred, gt),
            "ssim": ssim(pred, gt),
        }

    return step
