"""Weight-converter tests: diffusers-style state dicts → our param trees.

Offline strategy: synthesize a state dict with the exact diffusers key
naming for a tiny config, convert, and check every tensor lands in the
right tree slot with the right orientation (linears transposed, convs
untouched)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stable_nerf_tpu.models.diffusion.unet import (
    UNetConfig, tiny_unet_config, unet_apply, unet_init,
)
from stable_nerf_tpu.models.diffusion.vae import VAEConfig, vae_encode_moments, vae_init
from stable_nerf_tpu.models.diffusion.weights import (
    unet_params_from_state_dict,
    vae_params_from_state_dict,
)

TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_groups=8)


def _vae_state_dict(rng):
    """Diffusers AutoencoderKL key layout for the tiny config."""
    sd = {}

    def conv(name, ci, co, k):
        sd[name + ".weight"] = rng.normal(size=(co, ci, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(co,)).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(c,)).astype(np.float32)

    def lin(name, ci, co):
        sd[name + ".weight"] = rng.normal(size=(co, ci)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(co,)).astype(np.float32)

    def resnet(p, ci, co):
        norm(p + ".norm1", ci); conv(p + ".conv1", ci, co, 3)
        norm(p + ".norm2", co); conv(p + ".conv2", co, co, 3)
        if ci != co:
            conv(p + ".conv_shortcut", ci, co, 1)

    def attn(p, c):
        norm(p + ".group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(p + "." + n, c, c)
        lin(p + ".to_out.0", c, c)

    def mid(p, c):
        resnet(p + ".resnets.0", c, c)
        attn(p + ".attentions.0", c)
        resnet(p + ".resnets.1", c, c)

    conv("encoder.conv_in", 3, 16, 3)
    resnet("encoder.down_blocks.0.resnets.0", 16, 16)
    conv("encoder.down_blocks.0.downsamplers.0.conv", 16, 16, 3)
    resnet("encoder.down_blocks.1.resnets.0", 16, 32)
    mid("encoder.mid_block", 32)
    norm("encoder.conv_norm_out", 32)
    conv("encoder.conv_out", 32, 8, 3)
    conv("quant_conv", 8, 8, 1)
    conv("post_quant_conv", 4, 4, 1)
    conv("decoder.conv_in", 4, 32, 3)
    mid("decoder.mid_block", 32)
    resnet("decoder.up_blocks.0.resnets.0", 32, 32)
    resnet("decoder.up_blocks.0.resnets.1", 32, 32)
    conv("decoder.up_blocks.0.upsamplers.0.conv", 32, 32, 3)
    resnet("decoder.up_blocks.1.resnets.0", 32, 16)
    resnet("decoder.up_blocks.1.resnets.1", 16, 16)
    norm("decoder.conv_norm_out", 16)
    conv("decoder.conv_out", 16, 3, 3)
    return sd


def test_vae_conversion_structure_and_forward(rng):
    sd = _vae_state_dict(rng)
    params = vae_params_from_state_dict(sd, TINY_VAE)
    # structure identical to random init
    ref = vae_init(jnp.asarray(np.uint32([0, 1])), TINY_VAE)
    import jax
    assert (jax.tree.structure(params) == jax.tree.structure(ref))
    # tensors land unmodified (convs) at the right slots
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["conv_in"]["kernel"]),
        sd["encoder.conv_in.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["up_blocks"][1]["resnets"][0]["conv1"]["kernel"]),
        sd["decoder.up_blocks.1.resnets.0.conv1.weight"])
    # forward runs
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)).astype(np.float32))
    mean, logvar = vae_encode_moments(params, x, TINY_VAE)
    assert mean.shape == (1, 4, 16, 16)


def unet_state_dict_from_params(ref):
    """Flatten a unet param tree into a diffusers-style state dict via the
    known mapping (shared by the conversion and load_sdxl tests)."""
    sd = {}

    def put_lin(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[name + ".bias"] = np.asarray(p["bias"])

    def put_conv(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"])
        sd[name + ".bias"] = np.asarray(p["bias"])

    def put_norm(name, p):
        sd[name + ".weight"] = np.asarray(p["scale"])
        sd[name + ".bias"] = np.asarray(p["bias"])

    def put_resnet(name, p):
        put_norm(name + ".norm1", p["norm1"]); put_conv(name + ".conv1", p["conv1"])
        put_lin(name + ".time_emb_proj", p["time_emb_proj"])
        put_norm(name + ".norm2", p["norm2"]); put_conv(name + ".conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(name + ".conv_shortcut", p["conv_shortcut"])

    def put_attn(name, p):
        for n in ("to_q", "to_k", "to_v"):
            put_lin(name + "." + n, p[n])
        put_lin(name + ".to_out.0", p["to_out"])
        if "to_k_ip" in p:
            put_lin(name + ".to_k_ip", p["to_k_ip"])
            put_lin(name + ".to_v_ip", p["to_v_ip"])

    def put_transformer(name, p):
        put_norm(name + ".norm", p["norm"])
        put_lin(name + ".proj_in", p["proj_in"])
        for d, blk in enumerate(p["blocks"]):
            bp = f"{name}.transformer_blocks.{d}"
            put_norm(bp + ".norm1", blk["norm1"]); put_attn(bp + ".attn1", blk["attn1"])
            put_norm(bp + ".norm2", blk["norm2"]); put_attn(bp + ".attn2", blk["attn2"])
            put_norm(bp + ".norm3", blk["norm3"])
            put_lin(bp + ".ff.net.0.proj", blk["ff_geglu"])
            put_lin(bp + ".ff.net.2", blk["ff_out"])
        put_lin(name + ".proj_out", p["proj_out"])

    put_conv("conv_in", ref["conv_in"])
    put_lin("time_embedding.linear_1", ref["time_embedding"]["linear_1"])
    put_lin("time_embedding.linear_2", ref["time_embedding"]["linear_2"])
    put_lin("add_embedding.linear_1", ref["add_embedding"]["linear_1"])
    put_lin("add_embedding.linear_2", ref["add_embedding"]["linear_2"])
    for i, block in enumerate(ref["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            put_transformer(f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in block:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])
    for j, r in enumerate(ref["mid_block"]["resnets"]):
        put_resnet(f"mid_block.resnets.{j}", r)
    for j, a in enumerate(ref["mid_block"]["attentions"]):
        put_transformer(f"mid_block.attentions.{j}", a)
    for i, block in enumerate(ref["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            put_resnet(f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            put_transformer(f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in block:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", block["upsample"])
    put_norm("conv_norm_out", ref["conv_norm_out"])
    put_conv("conv_out", ref["conv_out"])
    return sd


def test_unet_conversion_tiny(rng):
    cfg = tiny_unet_config()
    import jax
    ref = unet_init(jax.random.PRNGKey(0), cfg, with_ip=True)
    sd = unet_state_dict_from_params(ref)
    params = unet_params_from_state_dict(sd, cfg, with_ip=True)
    for (pa, a), (pb, b) in zip(jax.tree.leaves_with_path(params),
                                jax.tree.leaves_with_path(ref)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_unet_ip_init_from_base_weights(rng):
    """When the state dict lacks ip weights, to_k_ip/to_v_ip must clone
    to_k/to_v (reference network.py:104-110)."""
    cfg = tiny_unet_config()
    import jax
    ref = unet_init(jax.random.PRNGKey(1), cfg, with_ip=False)
    # serialize without ip, convert with with_ip=True
    sd = {}
    # minimal: only one cross-attn layer matters — serialize everything
    from tests.test_weights import _vae_state_dict  # noqa: self import guard
    # reuse the tiny serializer above via module-level function
    # (duplicated inline to keep this test independent)
    # -- serialize --
    def put_lin(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[name + ".bias"] = np.asarray(p["bias"])
    def put_conv(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]); sd[name + ".bias"] = np.asarray(p["bias"])
    def put_norm(name, p):
        sd[name + ".weight"] = np.asarray(p["scale"]); sd[name + ".bias"] = np.asarray(p["bias"])
    def put_resnet(name, p):
        put_norm(name + ".norm1", p["norm1"]); put_conv(name + ".conv1", p["conv1"])
        put_lin(name + ".time_emb_proj", p["time_emb_proj"])
        put_norm(name + ".norm2", p["norm2"]); put_conv(name + ".conv2", p["conv2"])
        if "conv_shortcut" in p: put_conv(name + ".conv_shortcut", p["conv_shortcut"])
    def put_attn(name, p):
        for n in ("to_q", "to_k", "to_v"): put_lin(name + "." + n, p[n])
        put_lin(name + ".to_out.0", p["to_out"])
    def put_transformer(name, p):
        put_norm(name + ".norm", p["norm"]); put_lin(name + ".proj_in", p["proj_in"])
        for d, blk in enumerate(p["blocks"]):
            bp = f"{name}.transformer_blocks.{d}"
            put_norm(bp + ".norm1", blk["norm1"]); put_attn(bp + ".attn1", blk["attn1"])
            put_norm(bp + ".norm2", blk["norm2"]); put_attn(bp + ".attn2", blk["attn2"])
            put_norm(bp + ".norm3", blk["norm3"])
            put_lin(bp + ".ff.net.0.proj", blk["ff_geglu"])
            put_lin(bp + ".ff.net.2", blk["ff_out"])
        put_lin(name + ".proj_out", p["proj_out"])
    put_conv("conv_in", ref["conv_in"])
    for nm in ("time_embedding", "add_embedding"):
        put_lin(f"{nm}.linear_1", ref[nm]["linear_1"])
        put_lin(f"{nm}.linear_2", ref[nm]["linear_2"])
    for i, block in enumerate(ref["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            put_transformer(f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in block:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])
    for j, r in enumerate(ref["mid_block"]["resnets"]):
        put_resnet(f"mid_block.resnets.{j}", r)
    for j, a in enumerate(ref["mid_block"]["attentions"]):
        put_transformer(f"mid_block.attentions.{j}", a)
    for i, block in enumerate(ref["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            put_resnet(f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            put_transformer(f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in block:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", block["upsample"])
    put_norm("conv_norm_out", ref["conv_norm_out"])
    put_conv("conv_out", ref["conv_out"])

    params = unet_params_from_state_dict(sd, cfg, with_ip=True)
    blk = params["down_blocks"][1]["attentions"][0]["blocks"][0]["attn2"]
    np.testing.assert_array_equal(np.asarray(blk["to_k_ip"]["kernel"]),
                                  np.asarray(blk["to_k"]["kernel"]))
