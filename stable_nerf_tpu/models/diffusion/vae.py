"""SDXL AutoencoderKL (VAE) in functional JAX.

Architecture-parity with the frozen `stabilityai/stable-diffusion-xl-base-1.0`
VAE the reference loads (reference stable_diffusion/network.py:21-22): 4
down/up stages at channels (128, 256, 512, 512), 2 resnets per encoder stage
(3 per decoder stage), mid resnet-attention-resnet, GroupNorm(32, 1e-6),
silu, quant/post-quant 1×1 convs, latent scaling_factor 0.13025.

`encode` returns the diagonal-Gaussian moments; `encode_sample` draws with an
explicit key (the reference's `latent_dist.sample()` uses global torch RNG,
network.py:170-174).  Weight conversion from the HF safetensors checkpoint
lives in weights.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .nn import conv2d, group_norm, sdpa, silu


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.13025


def _resnet_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)

    def conv(k, ci, co, ksz):
        scale = 1.0 / math.sqrt(ci * ksz * ksz)
        return {
            "kernel": jax.random.uniform(k, (co, ci, ksz, ksz), jnp.float32,
                                         -scale, scale),
            "bias": jnp.zeros(co),
        }

    p = {
        "norm1": {"scale": jnp.ones(cin), "bias": jnp.zeros(cin)},
        "conv1": conv(k1, cin, cout, 3),
        "norm2": {"scale": jnp.ones(cout), "bias": jnp.zeros(cout)},
        "conv2": conv(k2, cout, cout, 3),
    }
    if cin != cout:
        p["conv_shortcut"] = conv(k3, cin, cout, 1)
    return p


def _resnet_apply(p, x, groups):
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups)))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    scale = 1.0 / math.sqrt(c)

    def lin(k):
        return {
            "kernel": jax.random.uniform(k, (c, c), jnp.float32, -scale, scale),
            "bias": jnp.zeros(c),
        }

    return {
        "group_norm": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "to_q": lin(ks[0]), "to_k": lin(ks[1]), "to_v": lin(ks[2]),
        "to_out": lin(ks[3]),
    }


def _attn_apply(p, x, groups):
    """Single-head spatial self-attention (diffusers VAE mid-block)."""
    n, c, h, w = x.shape
    y = group_norm(p["group_norm"], x, groups)
    y = y.reshape(n, c, h * w).transpose(0, 2, 1)             # [N, HW, C]
    q = (y @ p["to_q"]["kernel"].T.astype(y.dtype)) + p["to_q"]["bias"].astype(y.dtype)
    k = (y @ p["to_k"]["kernel"].T.astype(y.dtype)) + p["to_k"]["bias"].astype(y.dtype)
    v = (y @ p["to_v"]["kernel"].T.astype(y.dtype)) + p["to_v"]["bias"].astype(y.dtype)
    o = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]         # 1 head
    o = (o @ p["to_out"]["kernel"].T.astype(y.dtype)) + p["to_out"]["bias"].astype(y.dtype)
    return x + o.transpose(0, 2, 1).reshape(n, c, h, w)


def _mid_init(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnets": [_resnet_init(k1, c, c), _resnet_init(k3, c, c)],
        "attentions": [_attn_init(k2, c)],
    }


def _mid_apply(p, x, groups):
    x = _resnet_apply(p["resnets"][0], x, groups)
    x = _attn_apply(p["attentions"][0], x, groups)
    return _resnet_apply(p["resnets"][1], x, groups)


def vae_init(key, cfg: VAEConfig = VAEConfig()) -> Dict:
    """Random-init params with the converted-checkpoint tree structure."""
    keys = iter(jax.random.split(key, 64))
    ch = cfg.block_out_channels

    def conv(k, ci, co, ksz):
        scale = 1.0 / math.sqrt(ci * ksz * ksz)
        return {
            "kernel": jax.random.uniform(k, (co, ci, ksz, ksz), jnp.float32,
                                         -scale, scale),
            "bias": jnp.zeros(co),
        }

    enc_blocks = []
    cin = ch[0]
    for i, c in enumerate(ch):
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(_resnet_init(next(keys), cin if j == 0 else c, c))
        block = {"resnets": resnets}
        if i < len(ch) - 1:
            block["downsample"] = conv(next(keys), c, c, 3)
        enc_blocks.append(block)
        cin = c

    dec_ch = tuple(reversed(ch))                              # (512,512,256,128)
    dec_blocks = []
    cin = dec_ch[0]
    for i, c in enumerate(dec_ch):
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_resnet_init(next(keys), cin if j == 0 else c, c))
        block = {"resnets": resnets}
        if i < len(dec_ch) - 1:
            block["upsample"] = conv(next(keys), c, c, 3)
        dec_blocks.append(block)
        cin = c

    return {
        "encoder": {
            "conv_in": conv(next(keys), cfg.in_channels, ch[0], 3),
            "down_blocks": enc_blocks,
            "mid": _mid_init(next(keys), ch[-1]),
            "norm_out": {"scale": jnp.ones(ch[-1]), "bias": jnp.zeros(ch[-1])},
            "conv_out": conv(next(keys), ch[-1], 2 * cfg.latent_channels, 3),
        },
        "quant_conv": conv(next(keys), 2 * cfg.latent_channels,
                           2 * cfg.latent_channels, 1),
        "post_quant_conv": conv(next(keys), cfg.latent_channels,
                                cfg.latent_channels, 1),
        "decoder": {
            "conv_in": conv(next(keys), cfg.latent_channels, dec_ch[0], 3),
            "mid": _mid_init(next(keys), dec_ch[0]),
            "up_blocks": dec_blocks,
            "norm_out": {"scale": jnp.ones(dec_ch[-1]), "bias": jnp.zeros(dec_ch[-1])},
            "conv_out": conv(next(keys), dec_ch[-1], cfg.in_channels, 3),
        },
    }


def vae_save_npz(path: str, params: Dict, cfg: VAEConfig,
                 meta: Dict = None) -> None:
    """Persist a (trained) VAE param tree + its config to one ``.npz``.

    Keys are ``jax.tree_util.keystr`` paths; the config and any ``meta``
    dict (e.g. the pretraining script's recon PSNR / measured latent std)
    travel as a JSON sidecar entry.  Loader: :func:`vae_load_npz`.  Used
    by the learned-diffusion demo to hand the scene-pretrained tiny VAE
    to the joint loop (train.py --vae-checkpoint)."""
    import dataclasses
    import json

    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in flat}
    header = {"config": dataclasses.asdict(cfg), "meta": meta or {}}
    arrays["__vae_meta__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def vae_load_npz(path: str):
    """Load a :func:`vae_save_npz` artifact → (params, VAEConfig, meta)."""
    import json

    import numpy as np

    data = np.load(path)
    header = json.loads(bytes(data["__vae_meta__"].tobytes()).decode())
    cfg_dict = dict(header["config"])
    cfg_dict["block_out_channels"] = tuple(cfg_dict["block_out_channels"])
    cfg = VAEConfig(**cfg_dict)
    template = vae_init(jax.random.PRNGKey(0), cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl_leaf in flat:
        arr = data[jax.tree_util.keystr(kp)]
        if arr.shape != tmpl_leaf.shape:
            raise ValueError(
                f"{path}: leaf {jax.tree_util.keystr(kp)} has shape "
                f"{arr.shape}, config expects {tmpl_leaf.shape}")
        leaves.append(jnp.asarray(arr))
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, cfg, header["meta"]


def vae_encode_moments(params: Dict, x, cfg: VAEConfig = VAEConfig()):
    """images [N, 3, H, W] in [-1, 1] → (mean, logvar) each [N, 4, H/8, W/8]."""
    g = cfg.norm_groups
    e = params["encoder"]
    h = conv2d(e["conv_in"], x)
    for i, block in enumerate(e["down_blocks"]):
        for r in block["resnets"]:
            h = _resnet_apply(r, h, g)
        if "downsample" in block:
            # diffusers pads (0,1,0,1) then strides 2 with padding 0
            h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
            h = conv2d(block["downsample"], h, stride=2, padding=0)
    h = _mid_apply(e["mid"], h, g)
    h = conv2d(e["conv_out"], silu(group_norm(e["norm_out"], h, g)))
    moments = conv2d(params["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode_sample(params: Dict, x, key, cfg: VAEConfig = VAEConfig()):
    """Sample z ~ N(mean, std) and apply the scaling factor
    (reference SDNetwork.encode_images, network.py:170-174)."""
    mean, logvar = vae_encode_moments(params, x, cfg)
    std = jnp.exp(0.5 * logvar)
    z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return z * cfg.scaling_factor


def vae_encode_mode(params: Dict, x, cfg: VAEConfig = VAEConfig()):
    """Deterministic (mode) encode × scaling factor."""
    mean, _ = vae_encode_moments(params, x, cfg)
    return mean * cfg.scaling_factor


def vae_decode(params: Dict, z, cfg: VAEConfig = VAEConfig()):
    """latents [N, 4, h, w] (scaled) → images [N, 3, 8h, 8w]
    (reference SDNetwork.decode_latents, network.py:176-180)."""
    g = cfg.norm_groups
    z = z / cfg.scaling_factor
    d = params["decoder"]
    h = conv2d(params["post_quant_conv"], z, padding=0)
    h = conv2d(d["conv_in"], h)
    h = _mid_apply(d["mid"], h, g)
    for block in d["up_blocks"]:
        for r in block["resnets"]:
            h = _resnet_apply(r, h, g)
        if "upsample" in block:
            n, c, hh, ww = h.shape
            h = jax.image.resize(h, (n, c, hh * 2, ww * 2), "nearest")
            h = conv2d(block["upsample"], h)
    h = conv2d(d["conv_out"], silu(group_norm(d["norm_out"], h, g)))
    return h
