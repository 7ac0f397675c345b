"""Full DDIM-sampling inference: NeRF-conditioned novel-view generation.

Functional equivalent of reference train.py:323-432 (inference()):
per test batch, encode the reference image with the VAE, render the target
view's latent with the NeRF (max_steps 512), assemble the two 7-channel
conditions, then run a 50-step eta=0 DDIM denoise from pure noise and decode.

Reference quirks reproduced:
  * the NeRF latent is NOT renormalized ×2−1 here, unlike training
    (train.py:371 vs :75) — kept as-is for parity;
  * no classifier-free guidance by default (the CFG code is commented out
    in the reference, train.py:396-402, with guidance_scale=10.0 declared
    but unused at train.py:391).  ``guidance_scale > 1`` enables a working
    CFG — the commented reference code doubled the latents but never the
    conditioning; here the unconditional stream zeroes the image conditioning
    (NeRF latent + ray Plücker channels), the standard IP-Adapter negative.

The whole 50-step loop is one jitted lax.scan — no per-step host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.diffusion.scheduler import DDIMScheduler
from ..models.diffusion.sd_network import (
    decode_latents,
    encode_images,
    encode_images_mode,
    sd_forward,
)
from ..models.nerf.renderer import render
from ..utils.losses import l2_loss, psnr, ssim
from .joint import JointConfig, eval_sample_budget


def make_inference_step(
    cfg: JointConfig,
    scheduler: DDIMScheduler,
    num_steps: int = 50,
    *,
    compute_dtype=jnp.bfloat16,
    tp_axis=None,
    sp_axis=None,
    guidance_scale: float = 1.0,
    capture_attn_maps: bool = False,
    sample_budget=None,
):
    """Build the jitted per-batch inference function.

    ``sample_budget``: explicit NeRF eval-render budget — pass the
    occupancy-driven value from ``eval_budget_for_occupancy`` (VERDICT r2
    #7); None → the static 64/ray default.

    Returns fn(params, grid_state, batch, key) → dict with the denoised
    novel view plus PSNR/SSIM/L2 metrics against the GT target image.

    ``capture_attn_maps``: additionally return ``ip_attn_maps`` — the
    ip-stream cross-attention probability maps of the FINAL DDIM step
    (outermost layer first).  Mirrors the reference's per-processor
    ``attn_map`` attribute, which holds the last forward's maps after the
    denoise loop (attention_processor.py:390-392); the last step runs
    outside the scan to keep the other 49 steps map-free.

    ``tp_axis``/``sp_axis`` thread mesh axis names into the U-Net for
    tensor-/sequence-parallel serving; only meaningful under ``shard_map``
    (see ``make_sharded_inference_step``).

    ``guidance_scale``: 1.0 (default) = single conditional pass, exact
    reference parity.  > 1.0 = classifier-free guidance: each DDIM step
    also runs the U-Net with zeroed image conditioning and extrapolates
    ``eps = eps_uncond + s·(eps_cond − eps_uncond)`` (the reference's
    intended-but-commented path, train.py:391-402, guidance_scale 10.0).
    """
    ts = scheduler.timesteps(num_steps)

    def step(params, grid_state, batch, key):
        enc = cfg.latent_hw
        C = cfg.nerf.channel_dim
        k_vae, k_init = jax.random.split(key)

        target_image = batch["target_image"]
        reference_image = batch["reference_image"]
        B = target_image.shape[0]

        # cond 1: VAE latent of the reference view (train.py:363); the
        # encode draw follows the training loop's cfg.train.vae_encode
        # (TrainConfig docstring — "mode" when the VAE posterior is loose)
        if cfg.train.vae_encode == "mode":
            reference_lt = encode_images_mode(params["sd"], reference_image,
                                              cfg.sd)
        else:
            reference_lt = encode_images(params["sd"], reference_image,
                                         k_vae, cfg.sd)

        # cond 2: NeRF-rendered target latent, eval config (train.py:369)
        out = render(
            params["nerf"], grid_state,
            batch["target_rays_o"], batch["target_rays_d"], cfg.nerf,
            bg_color=cfg.train.bg_color, max_steps=cfg.train.max_steps_eval,
            compute_dtype=compute_dtype,
            sample_budget=(sample_budget if sample_budget is not None
                           else eval_sample_budget(B * enc * enc, cfg.train)),
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

        def unet_eps(x, t, capture=False):
            if guidance_scale != 1.0:
                # cond ++ uncond in ONE U-Net call: identical math to two
                # passes (samples are independent), but the doubled batch
                # feeds the MXU 2x-larger matmuls — the measured MFU lever
                # at batch-2 SDXL granularity (ARCHITECTURE.md perf notes).
                out = sd_forward(
                    params["sd"], jnp.concatenate([x, x]), t,
                    jnp.concatenate(
                        [image_embeds, jnp.zeros_like(image_embeds)]),
                    cfg.sd, compute_dtype=compute_dtype,
                    tp_axis=tp_axis, sp_axis=sp_axis,
                    capture_ip_attn_maps=capture)
                eps2, maps = out if capture else (out, None)
                if maps is not None:
                    # keep the conditional stream's maps (first half of the
                    # doubled batch, per the [x, x] concatenation order)
                    maps = [m[: m.shape[0] // 2] for m in maps]
                eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
            else:
                out = sd_forward(params["sd"], x, t, image_embeds, cfg.sd,
                                 compute_dtype=compute_dtype,
                                 tp_axis=tp_axis, sp_axis=sp_axis,
                                 capture_ip_attn_maps=capture)
                eps, maps = out if capture else (out, None)
            return eps, maps

        def body(x, t):
            eps, _ = unet_eps(x, t)
            x, _ = scheduler.step(eps, t, x, num_inference_steps=num_steps)
            return x, None

        ip_attn_maps = None
        if capture_attn_maps:
            latents, _ = jax.lax.scan(body, latents, jnp.asarray(ts[:-1]))
            eps, ip_attn_maps = unet_eps(latents, jnp.asarray(ts[-1]),
                                         capture=True)
            latents, _ = scheduler.step(eps, jnp.asarray(ts[-1]), latents,
                                        num_inference_steps=num_steps)
        else:
            latents, _ = jax.lax.scan(body, latents, jnp.asarray(ts))

        decoded = decode_latents(params["sd"], latents.astype(jnp.float32), cfg.sd)
        pred = jnp.clip((decoded + 1.0) / 2.0, 0.0, 1.0)       # train.py:408
        gt = jnp.clip((target_image + 1.0) / 2.0, 0.0, 1.0)

        # NeRF-side quality of the novel-view latent render, independent of
        # the (frozen) diffusion weights: PSNR of the NeRF latent vs the
        # deterministic VAE encoding of the GT target view — the quantity
        # the joint loss supervises (reference train.py:88).  This is the
        # metric that can demonstrate joint-loop learning even when the
        # SDXL weights are random (zero-egress env; the denoised-image
        # PSNR is gated on real pretrained weights).
        #
        # Both operands live in the NORMALIZED latent space the training
        # loss supervises (joint.forward_iteration to_gt: (lt+1)/2).
        # Until round 4 this compared the normalized render against the
        # RAW scaled latent — two different spaces, which caps the metric
        # near (1+Var[lt])/4 MSE (~3-6 dB) for even a PERFECT render and
        # was most of why the r3 learning demo read "flat at 5.9 dB"
        # (ROUND4_NOTES ceiling study).
        target_lt = encode_images_mode(params["sd"], target_image, cfg.sd)
        latent_psnr = psnr(pred_target_lt, (target_lt + 1.0) / 2.0)

        result = {
            "denoised_image": pred,
            "target_image": gt,
            "latent_psnr": latent_psnr,
            "reference_image": jnp.clip((reference_image + 1) / 2, 0, 1),
            "pred_target_latent": pred_target_lt,
            "l2_loss": l2_loss(pred, gt),
            "psnr": psnr(pred, gt),
            "ssim": ssim(pred, gt),
        }
        if ip_attn_maps is not None:
            result["ip_attn_maps"] = ip_attn_maps
        return result

    return step


def make_sharded_inference_step(
    cfg: JointConfig,
    scheduler: DDIMScheduler,
    num_steps: int = 50,
    *,
    mesh,
    tp: int = 1,
    sp: int = 1,
    compute_dtype=jnp.bfloat16,
    guidance_scale: float = 1.0,
    sample_budget=None,
):
    """Tensor-/sequence-parallel serving wrapper around the inference step.

    The 50-step DDIM U-Net scan dominates the per-batch cost; under this
    wrapper it shards over the mesh's ``model`` axis (megatron head/GEGLU
    split, tp ∈ {2,5,10} for SDXL) and/or ``seq`` axis (ring attention over
    latent tokens).  The NeRF render, VAE, and metric math are replicated —
    at serving shapes they are a small fraction of the step.

    Returns ``build(params) -> (placed_params, fn)``: call once with the
    restored params (GEGLU kernels are permuted and leaves device_put per
    their specs), then ``fn(placed_params, grid_state, batch, key)`` exactly
    like the unsharded step.

    The reference serves its eval loop single-GPU (train.py:323-432); this
    is the TPU scale-out for it.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sp import serving_param_specs

    tp_axis = "model" if tp > 1 else None
    sp_axis = "seq" if sp > 1 else None
    step = make_inference_step(cfg, scheduler, num_steps,
                               compute_dtype=compute_dtype,
                               tp_axis=tp_axis, sp_axis=sp_axis,
                               guidance_scale=guidance_scale,
                               sample_budget=sample_budget)

    def build(params):
        params, pspecs = serving_param_specs(params, tp,
                                             unet_keys=("sd", "unet"))
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                                 is_leaf=lambda x: isinstance(x, P))
        placed = jax.tree.map(jax.device_put, params, shardings)
        # grid/batch/key replicated via spec-prefix broadcasting; vma
        # replication inference is defeated by the SP path's mid-network
        # gathers (see parallel/sp.py)
        mapped = jax.shard_map(
            step, mesh=mesh, in_specs=(pspecs, P(), P(), P()),
            out_specs=P(), check_vma=sp_axis is None)
        jitted = jax.jit(mapped)
        rep = NamedSharding(mesh, P())

        def fn(p, grid_state, batch, key):
            # a checkpoint-restored grid is committed to one device —
            # re-place it replicated over the mesh (no-op when already
            # there) so the jitted computation sees one device set
            grid_state = jax.tree.map(lambda x: jax.device_put(x, rep),
                                      grid_state)
            return jitted(p, grid_state, batch, key)

        return placed, fn

    return build
