"""Pretrained-weight loading: HF diffusers/transformers checkpoints → our
param trees.

The reference pulls `stabilityai/stable-diffusion-xl-base-1.0` and
`openai/clip-vit-large-patch14` via from_pretrained (reference
stable_diffusion/network.py:21-47).  This module converts those checkpoints'
state dicts (torch .bin or .safetensors, loaded host-side) into the
functional param trees of vae.py / unet.py / clip_text.py.

Zero-egress note: the conversion is exercised in tests against randomly
initialized torch models (transformers is available offline); pointing
``load_sdxl`` at a downloaded checkpoint directory is all that's needed when
weights are present.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .unet import UNetConfig
from .vae import VAEConfig


def _to_jnp(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return jnp.asarray(np.asarray(x), jnp.float32)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-format state dict from a file (.safetensors or .bin)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


class _SD:
    """Key-access helper with conversion bookkeeping."""

    def __init__(self, sd: Dict):
        self.sd = sd
        self.used = set()

    def t(self, key):
        self.used.add(key)
        return _to_jnp(self.sd[key])

    def lin(self, prefix, transpose=True):
        p = {"kernel": self.t(prefix + ".weight")}
        if transpose:
            p["kernel"] = p["kernel"].T
        if prefix + ".bias" in self.sd:
            p["bias"] = self.t(prefix + ".bias")
            self.used.add(prefix + ".bias")
        return p

    def conv(self, prefix):
        return {"kernel": self.t(prefix + ".weight"),
                "bias": self.t(prefix + ".bias")}

    def norm(self, prefix):
        return {"scale": self.t(prefix + ".weight"),
                "bias": self.t(prefix + ".bias")}

    def has(self, key):
        return key in self.sd


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def vae_params_from_state_dict(sd: Dict, cfg: VAEConfig = VAEConfig()) -> Dict:
    """diffusers AutoencoderKL state_dict → vae.py param tree."""
    s = _SD(sd)

    def resnet(prefix):
        p = {
            "norm1": s.norm(prefix + ".norm1"),
            "conv1": s.conv(prefix + ".conv1"),
            "norm2": s.norm(prefix + ".norm2"),
            "conv2": s.conv(prefix + ".conv2"),
        }
        if s.has(prefix + ".conv_shortcut.weight"):
            p["conv_shortcut"] = s.conv(prefix + ".conv_shortcut")
        return p

    def attn(prefix):
        return {
            "group_norm": s.norm(prefix + ".group_norm"),
            # diffusers attention linears are [out, in]; vae.py applies
            # kernel.T so store untransposed
            "to_q": {"kernel": s.t(prefix + ".to_q.weight"),
                     "bias": s.t(prefix + ".to_q.bias")},
            "to_k": {"kernel": s.t(prefix + ".to_k.weight"),
                     "bias": s.t(prefix + ".to_k.bias")},
            "to_v": {"kernel": s.t(prefix + ".to_v.weight"),
                     "bias": s.t(prefix + ".to_v.bias")},
            "to_out": {"kernel": s.t(prefix + ".to_out.0.weight"),
                       "bias": s.t(prefix + ".to_out.0.bias")},
        }

    def mid(prefix):
        return {
            "resnets": [resnet(prefix + ".resnets.0"),
                        resnet(prefix + ".resnets.1")],
            "attentions": [attn(prefix + ".attentions.0")],
        }

    n = len(cfg.block_out_channels)
    enc_blocks = []
    for i in range(n):
        block = {"resnets": [
            resnet(f"encoder.down_blocks.{i}.resnets.{j}")
            for j in range(cfg.layers_per_block)
        ]}
        if i < n - 1:
            block["downsample"] = s.conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc_blocks.append(block)

    dec_blocks = []
    for i in range(n):
        block = {"resnets": [
            resnet(f"decoder.up_blocks.{i}.resnets.{j}")
            for j in range(cfg.layers_per_block + 1)
        ]}
        if i < n - 1:
            block["upsample"] = s.conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec_blocks.append(block)

    return {
        "encoder": {
            "conv_in": s.conv("encoder.conv_in"),
            "down_blocks": enc_blocks,
            "mid": mid("encoder.mid_block"),
            "norm_out": s.norm("encoder.conv_norm_out"),
            "conv_out": s.conv("encoder.conv_out"),
        },
        "quant_conv": s.conv("quant_conv"),
        "post_quant_conv": s.conv("post_quant_conv"),
        "decoder": {
            "conv_in": s.conv("decoder.conv_in"),
            "mid": mid("decoder.mid_block"),
            "up_blocks": dec_blocks,
            "norm_out": s.norm("decoder.conv_norm_out"),
            "conv_out": s.conv("decoder.conv_out"),
        },
    }


# ---------------------------------------------------------------------------
# U-Net
# ---------------------------------------------------------------------------

def unet_params_from_state_dict(
    sd: Dict, cfg: UNetConfig = UNetConfig(), with_ip: bool = True
) -> Dict:
    """diffusers UNet2DConditionModel state_dict → unet.py param tree.

    When ``with_ip`` and the state dict has no ip weights, to_k_ip/to_v_ip
    are initialized from to_k/to_v — the reference's init
    (stable_diffusion/network.py:104-110).
    """
    s = _SD(sd)

    def resnet(prefix):
        p = {
            "norm1": s.norm(prefix + ".norm1"),
            "conv1": s.conv(prefix + ".conv1"),
            "time_emb_proj": s.lin(prefix + ".time_emb_proj"),
            "norm2": s.norm(prefix + ".norm2"),
            "conv2": s.conv(prefix + ".conv2"),
        }
        if s.has(prefix + ".conv_shortcut.weight"):
            p["conv_shortcut"] = s.conv(prefix + ".conv_shortcut")
        return p

    def attention(prefix, cross):
        p = {
            "to_q": s.lin(prefix + ".to_q"),
            "to_k": s.lin(prefix + ".to_k"),
            "to_v": s.lin(prefix + ".to_v"),
            "to_out": s.lin(prefix + ".to_out.0"),
        }
        if cross and with_ip:
            if s.has(prefix + ".to_k_ip.weight"):
                p["to_k_ip"] = s.lin(prefix + ".to_k_ip")
                p["to_v_ip"] = s.lin(prefix + ".to_v_ip")
            else:
                p["to_k_ip"] = {"kernel": p["to_k"]["kernel"]}
                p["to_v_ip"] = {"kernel": p["to_v"]["kernel"]}
        return p

    def tblock(prefix):
        return {
            "norm1": s.norm(prefix + ".norm1"),
            "attn1": attention(prefix + ".attn1", cross=False),
            "norm2": s.norm(prefix + ".norm2"),
            "attn2": attention(prefix + ".attn2", cross=True),
            "norm3": s.norm(prefix + ".norm3"),
            "ff_geglu": s.lin(prefix + ".ff.net.0.proj"),
            "ff_out": s.lin(prefix + ".ff.net.2"),
        }

    def transformer(prefix, depth):
        return {
            "norm": s.norm(prefix + ".norm"),
            "proj_in": s.lin(prefix + ".proj_in"),
            "blocks": [tblock(f"{prefix}.transformer_blocks.{d}")
                       for d in range(depth)],
            "proj_out": s.lin(prefix + ".proj_out"),
        }

    n = len(cfg.block_out_channels)
    down = []
    for i in range(n):
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(resnet(f"down_blocks.{i}.resnets.{j}"))
            if cfg.transformer_layers[i] > 0:
                block["attentions"].append(
                    transformer(f"down_blocks.{i}.attentions.{j}",
                                cfg.transformer_layers[i]))
        if i < n - 1:
            block["downsample"] = s.conv(f"down_blocks.{i}.downsamplers.0.conv")
        down.append(block)

    rev_tl = tuple(reversed(cfg.transformer_layers))
    up = []
    for i in range(n):
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(resnet(f"up_blocks.{i}.resnets.{j}"))
            if rev_tl[i] > 0:
                block["attentions"].append(
                    transformer(f"up_blocks.{i}.attentions.{j}", rev_tl[i]))
        if i < n - 1:
            block["upsample"] = s.conv(f"up_blocks.{i}.upsamplers.0.conv")
        up.append(block)

    return {
        "conv_in": s.conv("conv_in"),
        "time_embedding": {
            "linear_1": s.lin("time_embedding.linear_1"),
            "linear_2": s.lin("time_embedding.linear_2"),
        },
        "add_embedding": {
            "linear_1": s.lin("add_embedding.linear_1"),
            "linear_2": s.lin("add_embedding.linear_2"),
        },
        "down_blocks": down,
        "mid_block": {
            "resnets": [resnet("mid_block.resnets.0"),
                        resnet("mid_block.resnets.1")],
            "attentions": [transformer("mid_block.attentions.0",
                                       cfg.transformer_layers[-1])]
            if cfg.transformer_layers[-1] > 0 else [],
        },
        "conv_norm_out": s.norm("conv_norm_out"),
        "conv_out": s.conv("conv_out"),
    }


# ---------------------------------------------------------------------------
# checkpoint directory entry point
# ---------------------------------------------------------------------------

def load_sdxl(checkpoint_dir: str, *, with_ip: bool = True,
              with_text_encoders: bool = True,
              unet_cfg: UNetConfig = UNetConfig(),
              vae_cfg: VAEConfig = VAEConfig(),
              text_cfg_1=None, text_cfg_2=None) -> Dict:
    """Load VAE + U-Net (+ both CLIP text towers) from an SDXL checkpoint
    directory laid out like the HF hub repo (vae/…, unet/…, text_encoder/…,
    text_encoder_2/… with safetensors or bin files).

    The text towers (reference stable_diffusion/network.py:25-30) exist only
    to cache the empty-prompt conditioning at init (network.py:114-168);
    the training loop pops them from this dict, runs
    ``clip_text.make_empty_prompt_conditioning``, and discards them so they
    never enter the jitted train step.  Missing text_encoder dirs degrade
    gracefully (returned dict simply lacks those keys)."""

    def find_weights(sub, names):
        d = os.path.join(checkpoint_dir, sub)
        for name in names:
            p = os.path.join(d, name)
            if os.path.exists(p):
                return load_state_dict(p)
        return None

    diffusion_names = ("diffusion_pytorch_model.safetensors",
                       "diffusion_pytorch_model.bin")
    text_names = ("model.safetensors", "pytorch_model.bin")

    vae_sd = find_weights("vae", diffusion_names)
    unet_sd = find_weights("unet", diffusion_names)
    if vae_sd is None or unet_sd is None:
        raise FileNotFoundError(
            f"no vae/unet weights found under {checkpoint_dir}")
    out = {
        "vae": vae_params_from_state_dict(vae_sd, vae_cfg),
        "unet": unet_params_from_state_dict(unet_sd, unet_cfg,
                                            with_ip=with_ip),
    }
    if with_text_encoders:
        from .clip_text import (
            clip_l_config, open_clip_bigg_config, params_from_hf_state_dict,
        )

        te1 = find_weights("text_encoder", text_names)
        te2 = find_weights("text_encoder_2", text_names)
        if te1 is not None:
            out["text_encoder"] = params_from_hf_state_dict(
                te1, text_cfg_1 or clip_l_config())
        if te2 is not None:
            out["text_encoder_2"] = params_from_hf_state_dict(
                te2, text_cfg_2 or open_clip_bigg_config())
    return out
