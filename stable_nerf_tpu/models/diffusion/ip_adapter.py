"""IP-Adapter conditioning modules: image projection + downsampling CNN.

Functional equivalents of:
  * ImageProjModel (reference stable_diffusion/ip_adapter/ip_adapter.py:28-46):
    Linear(embed_dim → tokens·cross_dim) → reshape → LayerNorm;
  * the conditioning downsampling CNN (reference stable_diffusion/
    network.py:62-70): Conv(7→16, k4 s2 p1) → ReLU → Conv(16→32, k4 s2 p1)
    → ReLU → Conv(32→64, k4 s4 p0) → ReLU, taking [B, 7, 64, 64] → [B, 64, 4, 4].

The per-attention-layer to_k_ip/to_v_ip weights live inside the U-Net params
(initialized from the U-Net's own to_k/to_v, reference network.py:104-110 —
see weights.py / sd_network.py).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from .nn import conv2d, linear


def image_proj_init(key, clip_embeddings_dim: int, cross_attention_dim: int,
                    num_tokens: int) -> Dict:
    k1, = jax.random.split(key, 1)
    scale = 1.0 / math.sqrt(clip_embeddings_dim)
    return {
        "proj": {
            "kernel": jax.random.uniform(
                k1, (clip_embeddings_dim, num_tokens * cross_attention_dim),
                jnp.float32, -scale, scale),
            "bias": jnp.zeros(num_tokens * cross_attention_dim),
        },
        "norm": {"scale": jnp.ones(cross_attention_dim),
                 "bias": jnp.zeros(cross_attention_dim)},
    }


def image_proj_apply(params: Dict, image_embeds) -> jnp.ndarray:
    """[B, embed_dim] → [B, num_tokens, cross_attention_dim].

    num_tokens/dim are inferred from the param shapes (params trees hold
    only array leaves so they are grad/optimizer-safe)."""
    d = params["norm"]["scale"].shape[0]
    t = params["proj"]["kernel"].shape[1] // d
    x = linear(params["proj"], image_embeds).reshape(-1, t, d)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return x * params["norm"]["scale"] + params["norm"]["bias"]


def downsampling_layers_init(key, in_channels: int = 7) -> Dict:
    ks = jax.random.split(key, 3)

    def conv(k, ci, co, ksz):
        scale = 1.0 / math.sqrt(ci * ksz * ksz)
        return {"kernel": jax.random.uniform(k, (co, ci, ksz, ksz),
                                             jnp.float32, -scale, scale),
                "bias": jnp.zeros(co)}

    return {
        "conv1": conv(ks[0], in_channels, 16, 4),
        "conv2": conv(ks[1], 16, 32, 4),
        "conv3": conv(ks[2], 32, 64, 4),
    }


def downsampling_layers_apply(params: Dict, x) -> jnp.ndarray:
    """[B, 7, 64, 64] → [B, 64, 4, 4] (reference network.py:62-70)."""
    x = jax.nn.relu(conv2d(params["conv1"], x, stride=2, padding=1))
    x = jax.nn.relu(conv2d(params["conv2"], x, stride=2, padding=1))
    x = jax.nn.relu(conv2d(params["conv3"], x, stride=4, padding=0))
    return x
