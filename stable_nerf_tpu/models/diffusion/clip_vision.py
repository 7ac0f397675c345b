"""CLIP vision transformer (image encoder) in functional JAX.

The reference loads `openai/clip-vit-large-patch14` as a
CLIPVisionModelWithProjection and exposes `clip_encode_images`
(reference stable_diffusion/network.py:29-31,182-189) — unused on the main
train path but part of the public surface (and of IP-Adapter variants).
Mirrors HF semantics: patch conv → [class] token + position embeddings →
pre-LN → encoder (non-causal attention, quick_gelu) → post-LN on the class
token → visual_projection.

The reference's `clip_image_processor` is just a bilinear Resize to the
encoder's input size (network.py:31) — provided here as `clip_resize`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def clip_vit_l14_config() -> CLIPVisionConfig:
    return CLIPVisionConfig()


def clip_vision_init(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Dict:
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    keys = iter(jax.random.split(key, 6 + 8 * L))

    def lin(k, din, dout):
        return {"kernel": jax.random.normal(k, (din, dout), dtype) * 0.02,
                "bias": jnp.zeros((dout,), dtype)}

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(L):
        layers.append({
            "ln1": ln(),
            "q": lin(next(keys), d, d), "k": lin(next(keys), d, d),
            "v": lin(next(keys), d, d), "out": lin(next(keys), d, d),
            "ln2": ln(),
            "fc1": lin(next(keys), d, ff), "fc2": lin(next(keys), ff, d),
        })
    return {
        "patch_embedding": jax.random.normal(
            next(keys), (d, 3, cfg.patch_size, cfg.patch_size), dtype) * 0.02,
        "class_embedding": jax.random.normal(next(keys), (d,), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (cfg.num_patches + 1, d), dtype) * 0.02,
        "pre_ln": ln(),
        "layers": layers,
        "post_ln": ln(),
        "visual_projection": jax.random.normal(
            next(keys), (d, cfg.projection_dim), dtype) * 0.02,
    }


def clip_vision_params_from_hf(state_dict, cfg: CLIPVisionConfig) -> Dict:
    """Convert torch CLIPVisionModelWithProjection state_dict."""
    def t(name):
        w = state_dict[name]
        arr = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        return jnp.asarray(arr, jnp.float32)

    def lin(prefix):
        return {"kernel": t(prefix + ".weight").T, "bias": t(prefix + ".bias")}

    def ln(prefix):
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias")}

    p = "vision_model."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "ln1": ln(lp + "layer_norm1"),
            "q": lin(lp + "self_attn.q_proj"),
            "k": lin(lp + "self_attn.k_proj"),
            "v": lin(lp + "self_attn.v_proj"),
            "out": lin(lp + "self_attn.out_proj"),
            "ln2": ln(lp + "layer_norm2"),
            "fc1": lin(lp + "mlp.fc1"),
            "fc2": lin(lp + "mlp.fc2"),
        })
    params = {
        "patch_embedding": t(p + "embeddings.patch_embedding.weight"),
        "class_embedding": t(p + "embeddings.class_embedding"),
        "position_embedding": t(p + "embeddings.position_embedding.weight"),
        "pre_ln": ln(p + "pre_layrnorm"),     # (sic — HF misspells it)
        "layers": layers,
        "post_ln": ln(p + "post_layernorm"),
    }
    if "visual_projection.weight" in state_dict:
        params["visual_projection"] = t("visual_projection.weight").T
    return params


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _act(name, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def clip_vision_apply(params: Dict, pixel_values, cfg: CLIPVisionConfig) -> Dict:
    """pixel_values [B, 3, H, W] (CLIP-normalized) → dict with
    last_hidden_state [B, 1+P, d], pooled [B, d], image_embeds [B, proj]."""
    B = pixel_values.shape[0]
    d = cfg.hidden_size
    h = jax.lax.conv_general_dilated(
        pixel_values, params["patch_embedding"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )                                                   # [B, d, P, P] no bias
    h = h.reshape(B, d, -1).transpose(0, 2, 1)          # [B, P², d]
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, d))
    x = jnp.concatenate([cls, h], axis=1) + params["position_embedding"][None]
    x = _ln(params["pre_ln"], x)

    nh = cfg.num_heads
    hd = d // nh
    for layer in params["layers"]:
        y = _ln(layer["ln1"], x)

        def proj(p, v):
            return (v @ p["kernel"] + p["bias"]).reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)

        q = proj(layer["q"], y) * (hd ** -0.5)
        k = proj(layer["k"], y)
        v = proj(layer["v"], y)
        a = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(B, -1, d)
        x = x + (o @ layer["out"]["kernel"] + layer["out"]["bias"])
        y = _ln(layer["ln2"], x)
        y = _act(cfg.hidden_act, y @ layer["fc1"]["kernel"] + layer["fc1"]["bias"])
        x = x + (y @ layer["fc2"]["kernel"] + layer["fc2"]["bias"])

    pooled = _ln(params["post_ln"], x[:, 0])
    out = {"last_hidden_state": x, "pooled": pooled}
    if "visual_projection" in params:
        out["image_embeds"] = pooled @ params["visual_projection"]
    return out


def clip_resize(images, size: int):
    """Bilinear resize to the encoder input size — the reference's whole
    'image processor' (network.py:31, T.Resize)."""
    B, C, H, W = images.shape
    return jax.image.resize(images, (B, C, size, size), "bilinear")


def clip_encode_images(params: Dict, images, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """reference SDNetwork.clip_encode_images (network.py:182-189): resize if
    needed, then projected image embeds."""
    if images.shape[-1] != cfg.image_size or images.shape[-2] != cfg.image_size:
        images = clip_resize(images, cfg.image_size)
    return clip_vision_apply(params, images, cfg)["image_embeds"]
