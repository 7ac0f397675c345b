"""SDNetwork: the assembled SDXL + IP-Adapter stack.

Functional equivalent of reference stable_diffusion/network.py:16-213
(SDNetwork): frozen VAE + U-Net + DDIM scheduler + cached empty-prompt SDXL
conditioning, with the trainable IP-Adapter head (ImageProjModel, per-layer
to_k_ip/to_v_ip, optional downsampling CNN).

Params are one dict tree; `trainable_mask` marks exactly the reference's
optimized subset (train.py:179-182): image_proj + downsampling + every
to_k_ip/to_v_ip.  Everything else is frozen pretrained weight.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import SchedulerConfig, SDConfig
from .ip_adapter import (
    downsampling_layers_apply,
    downsampling_layers_init,
    image_proj_apply,
    image_proj_init,
)
from .scheduler import DDIMScheduler
from .unet import UNetConfig, sdxl_unet_config, unet_apply, unet_init
from .vae import VAEConfig, vae_decode, vae_encode_mode, vae_encode_sample, vae_init


@dataclass(frozen=True)
class SDNetworkConfig:
    sd: SDConfig = field(default_factory=SDConfig)
    unet: UNetConfig = field(default_factory=sdxl_unet_config)
    vae: VAEConfig = field(default_factory=VAEConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)

    @property
    def proj_dim(self) -> int:
        """IP image-embed dim entering ImageProjModel
        (reference network.py:54,70: 64·4·4 with the CNN at latent 64,
        7·64² without; generalized to the configured latent size)."""
        if self.sd.use_downsampling_layers:
            # the CNN downsamples 16× spatially into 64 channels
            return 64 * max(self.sd.latent_size // 16, 1) ** 2
        return self.sd.cond_channels * self.sd.latent_size ** 2


def sd_network_init(
    key,
    cfg: SDNetworkConfig = SDNetworkConfig(),
    *,
    add_text_embeds=None,
    add_time_ids=None,
) -> Dict:
    """Random init (tests / scratch).  Pretrained loading: weights.py.

    add_text_embeds/add_time_ids: cached empty-prompt conditioning
    (reference init_empty_prompts, network.py:114-168).  Defaults: zeros
    pooled embeds + the SDXL [1024, 1024, 0, 0, 1024, 1024] time ids.
    """
    k_vae, k_unet, k_proj, k_down = jax.random.split(key, 4)
    params = {
        "vae": vae_init(k_vae, cfg.vae),
        "unet": unet_init(k_unet, cfg.unet, with_ip=True),
        "image_proj": image_proj_init(
            k_proj, cfg.proj_dim, cfg.unet.cross_attention_dim,
            cfg.sd.num_tokens,
        ),
    }
    if cfg.sd.use_downsampling_layers:
        params["downsampling"] = downsampling_layers_init(
            k_down, cfg.sd.cond_channels
        )
    if add_text_embeds is None:
        add_text_embeds = jnp.zeros((1, cfg.unet.pooled_projection_dim))
    if add_time_ids is None:
        r = 1024.0
        add_time_ids = jnp.asarray([[r, r, 0.0, 0.0, r, r]])
    params["add_text_embeds"] = jnp.asarray(add_text_embeds, jnp.float32)
    params["add_time_ids"] = jnp.asarray(add_time_ids, jnp.float32)
    return params


def init_ip_from_unet(params: Dict) -> Dict:
    """Copy each cross-attention's to_k/to_v into to_k_ip/to_v_ip — the
    reference's IP weight init (network.py:104-110)."""

    def visit(tree):
        if isinstance(tree, dict):
            if "to_k_ip" in tree and "to_k" in tree:
                tree = dict(tree)
                # materialize fresh buffers: to_k_ip trains while to_k
                # stays frozen, and a shared buffer breaks donated train
                # steps ("donate the same buffer twice")
                tree["to_k_ip"] = jax.tree.map(jnp.copy, tree["to_k"])
                tree["to_v_ip"] = jax.tree.map(jnp.copy, tree["to_v"])
                return tree
            return {k: visit(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [visit(v) for v in tree]
        return tree

    out = dict(params)
    out["unet"] = visit(params["unet"])
    return out


def trainable_mask(params: Dict) -> Dict:
    """Boolean pytree: True on the reference's optimized parameter subset
    (train.py:179-182): image_proj, downsampling, and all to_*_ip."""

    def unet_mask(tree, inside_ip=False):
        if isinstance(tree, dict):
            return {
                k: unet_mask(v, inside_ip or k in ("to_k_ip", "to_v_ip"))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [unet_mask(v, inside_ip) for v in tree]
        return inside_ip

    mask = {}
    for k, v in params.items():
        if k in ("image_proj", "downsampling"):
            mask[k] = jax.tree.map(lambda _: True, v)
        elif k == "unet":
            mask[k] = unet_mask(v)
        else:
            mask[k] = jax.tree.map(lambda _: False, v)
    return mask


# ---------------------------------------------------------------------------
# forward paths (reference network.py:170-212)
# ---------------------------------------------------------------------------

def encode_images(params: Dict, images, key, cfg: SDNetworkConfig = SDNetworkConfig()):
    """images [B, 3, H, W] in [-1, 1] → scaled latents [B, 4, H/8, W/8]
    (reference encode_images: latent_dist.sample() · scaling_factor)."""
    return vae_encode_sample(params["vae"], images, key, cfg.vae)


def encode_images_mode(params: Dict, images, cfg: SDNetworkConfig = SDNetworkConfig()):
    """Deterministic variant (distribution mode)."""
    return vae_encode_mode(params["vae"], images, cfg.vae)


def decode_latents(params: Dict, latents, cfg: SDNetworkConfig = SDNetworkConfig()):
    """scaled latents → images (reference decode_latents)."""
    return vae_decode(params["vae"], latents, cfg.vae)


def embed_conditions(params: Dict, image_embeds,
                     cfg: SDNetworkConfig = SDNetworkConfig(),
                     views_per_sample: int = 2):
    """Conditioning images → ip tokens.

    Mirrors reference SDNetwork.forward's front half (network.py:191-207):
    optional CNN downsample, flatten per view, ImageProjModel, then reshape
    [B·views, tokens, D] → [B, views·tokens, D].

    Args:
      image_embeds: [B·views, cond_channels, latent, latent] — target and
        reference conditions stacked on the batch axis (train.py:82).
    """
    x = image_embeds
    if "downsampling" in params:
        x = downsampling_layers_apply(params["downsampling"], x)
    bs = x.shape[0] // views_per_sample
    flat = x.reshape(x.shape[0], -1)
    tokens = image_proj_apply(params["image_proj"], flat)
    return tokens.reshape(bs, views_per_sample * cfg.sd.num_tokens, -1)


def sd_forward(
    params: Dict,
    noisy_latents,
    timesteps,
    image_embeds,
    cfg: SDNetworkConfig = SDNetworkConfig(),
    *,
    compute_dtype=jnp.float32,
    tp_axis=None,
    sp_axis=None,
    capture_ip_attn_maps: bool = False,
):
    """Noise prediction conditioned ONLY on ip tokens
    (reference SDNetwork.forward, network.py:191-212).

    Args:
      noisy_latents: [B, 4, h, w].
      timesteps: scalar or [B].
      image_embeds: [B·2, cond_channels, latent, latent].
      tp_axis / sp_axis: mesh axis names forwarded to ``unet_apply`` for
        tensor-/sequence-parallel serving under `shard_map` (the tiny
        conditioning path stays replicated; only the U-Net shards).
      capture_ip_attn_maps: also return the ip-stream attention maps
        (reference attention_processor.py:390-392 viz state) — the return
        becomes ``(noise_pred, [maps...])``.
    """
    ip_tokens = embed_conditions(params, image_embeds, cfg)
    B = noisy_latents.shape[0]
    out = unet_apply(
        params["unet"], noisy_latents, timesteps, ip_tokens,
        added_text_embeds=jnp.broadcast_to(
            params["add_text_embeds"], (B, params["add_text_embeds"].shape[-1])
        ),
        added_time_ids=jnp.broadcast_to(params["add_time_ids"], (B, 6)),
        cfg=cfg.unet,
        compute_dtype=compute_dtype,
        tp_axis=tp_axis,
        sp_axis=sp_axis,
        capture_ip_attn_maps=capture_ip_attn_maps,
    )
    if capture_ip_attn_maps:
        eps, aux = out
        return eps, aux["ip_attn_maps"]
    return out
