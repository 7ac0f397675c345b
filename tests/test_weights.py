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
    """Diffusers-style state dict from a unet param tree — now a thin
    wrapper over the production exporter (weights.export_unet_state_dict),
    kept for test_clip_text.py's fixture factory."""
    import numpy as np
    from stable_nerf_tpu.models.diffusion.weights import export_unet_state_dict
    return {k: np.asarray(v) for k, v in export_unet_state_dict(ref).items()}


def test_unet_conversion_tiny(rng):
    cfg = tiny_unet_config()
    import jax
    ref = unet_init(jax.random.PRNGKey(0), cfg, with_ip=True)
    sd = unet_state_dict_from_params(ref)
    params = unet_params_from_state_dict(sd, cfg, with_ip=True, strict=True)
    got, want = jax.tree.leaves_with_path(params), jax.tree.leaves_with_path(ref)
    assert len(got) == len(want)     # zip() must not silently truncate
    for (pa, a), (pb, b) in zip(got, want):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_unet_ip_init_from_base_weights(rng):
    """When the state dict lacks ip weights, to_k_ip/to_v_ip must clone
    to_k/to_v (reference network.py:104-110)."""
    cfg = tiny_unet_config()
    import jax
    ref = unet_init(jax.random.PRNGKey(1), cfg, with_ip=False)
    sd = unet_state_dict_from_params(ref)          # no ip keys present
    params = unet_params_from_state_dict(sd, cfg, with_ip=True, strict=True)
    blk = params["down_blocks"][1]["attentions"][0]["blocks"][0]["attn2"]
    np.testing.assert_array_equal(np.asarray(blk["to_k_ip"]["kernel"]),
                                  np.asarray(blk["to_k"]["kernel"]))

class TestStrictContract:
    """VERDICT r2 next #3: the loading contract that must survive first
    contact with a real checkpoint — every key consumed, every leaf
    filled, full-config coverage locked by committed manifests."""

    def test_strict_rejects_unconsumed_key(self, rng):
        import jax
        cfg = tiny_unet_config()
        sd = unet_state_dict_from_params(unet_init(jax.random.PRNGKey(0),
                                                   cfg, with_ip=True))
        sd["down_blocks.0.attn_extra.weight"] = np.zeros((4, 4), np.float32)
        with pytest.raises(ValueError, match="not consumed"):
            unet_params_from_state_dict(sd, cfg, with_ip=True, strict=True)

    def test_missing_key_error_names_the_key(self, rng):
        import jax
        cfg = tiny_unet_config()
        sd = unet_state_dict_from_params(unet_init(jax.random.PRNGKey(0),
                                                   cfg, with_ip=True))
        del sd["mid_block.resnets.0.conv1.weight"]
        with pytest.raises(KeyError, match="mid_block.resnets.0.conv1"):
            unet_params_from_state_dict(sd, cfg, with_ip=True)

    def test_vae_export_roundtrip(self, rng):
        import jax
        from stable_nerf_tpu.models.diffusion.weights import (
            export_vae_state_dict,
        )
        ref = vae_init(jax.random.PRNGKey(2), TINY_VAE)
        sd = {k: np.asarray(v)
              for k, v in export_vae_state_dict(ref, TINY_VAE).items()}
        params = vae_params_from_state_dict(sd, TINY_VAE, strict=True)
        got = jax.tree.leaves_with_path(params)
        want = jax.tree.leaves_with_path(ref)
        assert len(got) == len(want)
        for (pa, a), (pb, b) in zip(got, want):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_sdxl_unet_manifest_locked(self):
        """The abstract full-config key template equals the committed
        manifest (1680 keys / 2,567,463,684 params — the publicly
        documented SDXL base U-Net size)."""
        import json, os
        from stable_nerf_tpu.models.diffusion.unet import sdxl_unet_config
        from stable_nerf_tpu.models.diffusion.weights import (
            unet_state_dict_template,
        )
        template = unet_state_dict_template(sdxl_unet_config())
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "sdxl_unet_keys.json")
        manifest = json.load(open(path))
        assert {k: list(v.shape) for k, v in template.items()} == manifest
        n_params = sum(int(np.prod(s)) if s else 1 for s in manifest.values())
        assert n_params == 2_567_463_684
        assert len(manifest) == 1680

    def test_full_sdxl_vae_manifest_locked(self):
        import json, os
        from stable_nerf_tpu.models.diffusion.weights import (
            vae_state_dict_template,
        )
        template = vae_state_dict_template(VAEConfig())
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "sdxl_vae_keys.json")
        manifest = json.load(open(path))
        assert {k: list(v.shape) for k, v in template.items()} == manifest
        n_params = sum(int(np.prod(s)) if s else 1 for s in manifest.values())
        assert n_params == 83_653_863

    def test_full_config_conversion_covers_manifest_abstractly(self):
        """jax.eval_shape-run the converter on the full-size manifest:
        strict mode proves every manifest key is consumed, and the result
        must match the full-size init tree leaf-for-leaf (every leaf
        filled, right shapes) — all without allocating 10 GB."""
        import jax
        from stable_nerf_tpu.models.diffusion.unet import sdxl_unet_config
        from stable_nerf_tpu.models.diffusion.weights import (
            assert_tree_matches, unet_state_dict_template,
        )
        cfg = sdxl_unet_config()
        template = unet_state_dict_template(cfg)     # stock ckpt: no ip keys
        converted = jax.eval_shape(
            lambda sd: unet_params_from_state_dict(sd, cfg, with_ip=True,
                                                   strict=True),
            template)
        expect = jax.eval_shape(
            lambda: unet_init(jax.random.PRNGKey(0), cfg, with_ip=True))
        assert_tree_matches(converted, expect, "U-Net full config")

class TestPrecheck:
    """precheck_sdxl_checkpoint: header-only key/shape gate for train.py
    --sdxl-checkpoint startup."""

    def _write_ckpt(self, root, unet_sd, vae_sd):
        from safetensors.numpy import save_file
        (root / "unet").mkdir(parents=True)
        (root / "vae").mkdir(parents=True)
        save_file({k: np.asarray(v) for k, v in unet_sd.items()},
                  str(root / "unet" / "diffusion_pytorch_model.safetensors"))
        save_file({k: np.asarray(v) for k, v in vae_sd.items()},
                  str(root / "vae" / "diffusion_pytorch_model.safetensors"))

    def _tiny_sds(self, rng):
        import jax
        from stable_nerf_tpu.models.diffusion.weights import (
            export_vae_state_dict,
        )
        unet_sd = unet_state_dict_from_params(
            unet_init(jax.random.PRNGKey(0), tiny_unet_config(),
                      with_ip=False))
        vae_sd = {k: np.asarray(v) for k, v in export_vae_state_dict(
            vae_init(jax.random.PRNGKey(1), TINY_VAE), TINY_VAE).items()}
        return unet_sd, vae_sd

    def test_clean_checkpoint_passes(self, tmp_path, rng):
        from stable_nerf_tpu.models.diffusion.weights import (
            precheck_sdxl_checkpoint,
        )
        unet_sd, vae_sd = self._tiny_sds(rng)
        self._write_ckpt(tmp_path, unet_sd, vae_sd)
        precheck_sdxl_checkpoint(str(tmp_path), unet_cfg=tiny_unet_config(),
                                 vae_cfg=TINY_VAE)

    def test_ip_keys_are_optional_extras(self, tmp_path, rng):
        import jax
        from stable_nerf_tpu.models.diffusion.weights import (
            export_unet_state_dict, export_vae_state_dict,
            precheck_sdxl_checkpoint,
        )
        unet_sd = {k: np.asarray(v) for k, v in export_unet_state_dict(
            unet_init(jax.random.PRNGKey(0), tiny_unet_config(),
                      with_ip=True)).items()}
        _, vae_sd = self._tiny_sds(rng)
        self._write_ckpt(tmp_path, unet_sd, vae_sd)
        precheck_sdxl_checkpoint(str(tmp_path), unet_cfg=tiny_unet_config(),
                                 vae_cfg=TINY_VAE)

    def test_missing_and_bad_shape_fail_with_diff(self, tmp_path, rng):
        from stable_nerf_tpu.models.diffusion.weights import (
            precheck_sdxl_checkpoint,
        )
        unet_sd, vae_sd = self._tiny_sds(rng)
        del unet_sd["conv_out.bias"]
        vae_sd["quant_conv.weight"] = np.zeros((3, 3, 1, 1), np.float32)
        self._write_ckpt(tmp_path, unet_sd, vae_sd)
        with pytest.raises(ValueError) as e:
            precheck_sdxl_checkpoint(str(tmp_path),
                                     unet_cfg=tiny_unet_config(),
                                     vae_cfg=TINY_VAE)
        msg = str(e.value)
        assert "missing" in msg and "conv_out.bias" in msg
        assert "shape mismatch" in msg and "quant_conv.weight" in msg

    def test_missing_dir_fails(self, tmp_path):
        from stable_nerf_tpu.models.diffusion.weights import (
            precheck_sdxl_checkpoint,
        )
        with pytest.raises(ValueError, match="no weights file"):
            precheck_sdxl_checkpoint(str(tmp_path),
                                     unet_cfg=tiny_unet_config(),
                                     vae_cfg=TINY_VAE)
