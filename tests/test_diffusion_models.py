"""VAE / U-Net / SDNetwork structural and semantic tests (tiny configs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.config import SDConfig
from stable_nerf_tpu.models.diffusion.ip_adapter import (
    downsampling_layers_apply,
    downsampling_layers_init,
    image_proj_apply,
    image_proj_init,
)
from stable_nerf_tpu.models.diffusion.nn import sdpa, split_heads, merge_heads, linear
from stable_nerf_tpu.models.diffusion.sd_network import (
    SDNetworkConfig,
    embed_conditions,
    init_ip_from_unet,
    sd_forward,
    sd_network_init,
    trainable_mask,
)
from stable_nerf_tpu.models.diffusion.unet import (
    UNetConfig,
    tiny_unet_config,
    unet_apply,
    unet_init,
)
from stable_nerf_tpu.models.diffusion.vae import (
    VAEConfig,
    vae_decode,
    vae_encode_mode,
    vae_encode_moments,
    vae_encode_sample,
    vae_init,
)

TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_groups=8)


class TestVAE:
    def test_encode_decode_shapes(self, key):
        params = vae_init(key, TINY_VAE)
        x = jax.random.normal(key, (2, 3, 32, 32))
        mean, logvar = vae_encode_moments(params, x, TINY_VAE)
        # 2 blocks → one downsample → /2
        assert mean.shape == (2, 4, 16, 16) and logvar.shape == mean.shape
        z = vae_encode_sample(params, x, key, TINY_VAE)
        assert z.shape == (2, 4, 16, 16)
        img = vae_decode(params, z, TINY_VAE)
        assert img.shape == (2, 3, 32, 32)
        assert bool(jnp.all(jnp.isfinite(img)))

    def test_scaling_factor_applied(self, key):
        params = vae_init(key, TINY_VAE)
        x = jax.random.normal(key, (1, 3, 32, 32))
        mode = vae_encode_mode(params, x, TINY_VAE)
        mean, _ = vae_encode_moments(params, x, TINY_VAE)
        np.testing.assert_allclose(np.asarray(mode),
                                   np.asarray(mean) * TINY_VAE.scaling_factor,
                                   rtol=1e-6)

    def test_sample_uses_key(self, key):
        params = vae_init(key, TINY_VAE)
        x = jax.random.normal(key, (1, 3, 32, 32))
        z1 = vae_encode_sample(params, x, jax.random.PRNGKey(1), TINY_VAE)
        z2 = vae_encode_sample(params, x, jax.random.PRNGKey(2), TINY_VAE)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))

    def test_sdxl_vae_param_count(self, key):
        """Full-size VAE must have the SDXL parameter count (~83.7M)."""
        params = vae_init(key, VAEConfig())
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert abs(n - 83_653_863) < 200_000, n


class TestUNet:
    cfg = tiny_unet_config()

    def _cond(self, key, B):
        ehs = jax.random.normal(key, (B, 4, self.cfg.cross_attention_dim))
        pooled = jax.random.normal(key, (B, self.cfg.pooled_projection_dim))
        tids = jnp.tile(jnp.asarray([[32., 32., 0., 0., 32., 32.]]), (B, 1))
        return ehs, pooled, tids

    def test_output_shape_and_finite(self, key):
        params = unet_init(key, self.cfg)
        x = jax.random.normal(key, (2, 4, 16, 16))
        ehs, pooled, tids = self._cond(key, 2)
        out = unet_apply(params, x, jnp.asarray([10, 500]), ehs,
                         added_text_embeds=pooled, added_time_ids=tids,
                         cfg=self.cfg)
        assert out.shape == (2, 4, 16, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.slow
    def test_scalar_timestep_broadcast(self, key):
        params = unet_init(key, self.cfg)
        x = jax.random.normal(key, (2, 4, 8, 8))
        ehs, pooled, tids = self._cond(key, 2)
        out1 = unet_apply(params, x, 7, ehs, added_text_embeds=pooled,
                          added_time_ids=tids, cfg=self.cfg)
        out2 = unet_apply(params, x, jnp.asarray([7, 7]), ehs,
                          added_text_embeds=pooled, added_time_ids=tids,
                          cfg=self.cfg)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)

    @pytest.mark.slow
    def test_ip_two_stream_semantics(self, key):
        """With ip_scale=0 the ip tokens must not influence the output; with
        scale>0 they must.  (attention_processor.py:396: out + scale·ip)"""
        params = unet_init(key, self.cfg)
        x = jax.random.normal(key, (1, 4, 8, 8))
        ehs, pooled, tids = self._cond(key, 1)
        ehs2 = ehs.at[:, 2:].set(jax.random.normal(jax.random.PRNGKey(9),
                                                   ehs[:, 2:].shape))
        cfg0 = UNetConfig(**{**self.cfg.__dict__, "ip_scale": 0.0})
        a = unet_apply(params, x, 5, ehs, added_text_embeds=pooled,
                       added_time_ids=tids, cfg=cfg0)
        b = unet_apply(params, x, 5, ehs2, added_text_embeds=pooled,
                       added_time_ids=tids, cfg=cfg0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        c = unet_apply(params, x, 5, ehs2, added_text_embeds=pooled,
                       added_time_ids=tids, cfg=self.cfg)
        assert not np.allclose(np.asarray(b), np.asarray(c), atol=1e-5)

    @pytest.mark.slow
    def test_remat_matches_plain(self, key):
        """cfg.remat must change memory, never math: value AND grads equal
        the non-remat forward/backward bit-for-bit (same ops re-run)."""
        params = unet_init(key, self.cfg)
        x = jax.random.normal(key, (2, 4, 8, 8))
        ehs, pooled, tids = self._cond(key, 2)
        cfg_r = dataclasses.replace(self.cfg, remat=True)

        def loss(p, cfg):
            eps = unet_apply(p, x, 5, ehs, added_text_embeds=pooled,
                             added_time_ids=tids, cfg=cfg)
            return jnp.mean(eps ** 2)

        v0, g0 = jax.value_and_grad(loss)(params, self.cfg)
        v1, g1 = jax.value_and_grad(loss)(params, cfg_r)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_no_ip_params_plain_cross_attention(self, key):
        params = unet_init(key, self.cfg, with_ip=False)
        x = jax.random.normal(key, (1, 4, 8, 8))
        ehs, pooled, tids = self._cond(key, 1)
        out = unet_apply(params, x, 5, ehs, added_text_embeds=pooled,
                         added_time_ids=tids, cfg=self.cfg)
        assert out.shape == (1, 4, 8, 8)

    def test_capture_ip_attn_maps(self, key):
        """Opt-in viz capture (the reference's IPAttnProcessor attn_map
        state, attention_processor.py:390-392): one map per ip
        cross-attention layer, rows summing to 1, eps unchanged."""
        params = unet_init(key, self.cfg)
        x = jax.random.normal(key, (1, 4, 8, 8))
        ehs, pooled, tids = self._cond(key, 1)
        plain = unet_apply(params, x, 5, ehs, added_text_embeds=pooled,
                           added_time_ids=tids, cfg=self.cfg)
        eps, aux = unet_apply(params, x, 5, ehs, added_text_embeds=pooled,
                              added_time_ids=tids, cfg=self.cfg,
                              capture_ip_attn_maps=True)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(eps),
                                   rtol=1e-6)
        maps = aux["ip_attn_maps"]
        # tiny config (transformer_layers=(0,1)): 2 down + 1 mid + 3 up
        # transformers, each 1 block deep → 6 ip cross-attn layers
        assert len(maps) == 6, len(maps)
        for m in maps:
            assert m.shape[-1] == self.cfg.ip_num_tokens
            np.testing.assert_allclose(
                np.asarray(m.sum(axis=-1)), 1.0, atol=1e-5)

    @pytest.mark.slow
    def test_sdxl_unet_param_count(self, key):
        """Full-size U-Net (without ip) ≈ 2.567B params (SDXL base)."""
        params = unet_init(jax.random.PRNGKey(0), UNetConfig(), with_ip=False)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert abs(n - 2_567_463_684) < 5_000_000, n


class TestIPAdapterModules:
    def test_image_proj(self, key):
        p = image_proj_init(key, clip_embeddings_dim=1024,
                            cross_attention_dim=64, num_tokens=2)
        x = jax.random.normal(key, (4, 1024))
        out = image_proj_apply(p, x)
        assert out.shape == (4, 2, 64)
        # LayerNorm: per-token zero mean / unit variance before affine
        np.testing.assert_allclose(np.asarray(jnp.mean(out, -1)), 0, atol=1e-4)

    def test_downsampling_cnn_shape(self, key):
        p = downsampling_layers_init(key, 7)
        x = jax.random.normal(key, (2, 7, 64, 64))
        out = downsampling_layers_apply(p, x)
        assert out.shape == (2, 64, 4, 4)      # network.py:62-70 comments
        assert float(jnp.min(out)) >= 0        # final ReLU


class TestSDNetwork:
    def small_cfg(self):
        return SDNetworkConfig(
            sd=SDConfig(num_tokens=2, use_downsampling_layers=True,
                        cross_attention_dim=48, latent_size=64),
            unet=tiny_unet_config(),
            vae=TINY_VAE,
        )

    def test_init_and_embed_conditions(self, key):
        cfg = self.small_cfg()
        params = sd_network_init(key, cfg)
        embeds = jax.random.normal(key, (4, 7, 64, 64))    # B=2 × 2 views
        tokens = embed_conditions(params, embeds, cfg)
        assert tokens.shape == (2, 4, cfg.unet.cross_attention_dim)

    def test_sd_forward(self, key):
        cfg = self.small_cfg()
        params = sd_network_init(key, cfg)
        noisy = jax.random.normal(key, (2, 4, 16, 16))
        embeds = jax.random.normal(key, (4, 7, 64, 64))
        out = sd_forward(params, noisy, jnp.asarray([3, 99]), embeds, cfg)
        assert out.shape == (2, 4, 16, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_init_ip_from_unet_copies(self, key):
        cfg = self.small_cfg()
        params = sd_network_init(key, cfg)
        params = init_ip_from_unet(params)

        found = []

        def check(tree):
            if isinstance(tree, dict):
                if "to_k_ip" in tree:
                    found.append(np.allclose(
                        np.asarray(tree["to_k_ip"]["kernel"]),
                        np.asarray(tree["to_k"]["kernel"])))
                for v in tree.values():
                    check(v)
            elif isinstance(tree, list):
                for v in tree:
                    check(v)

        check(params["unet"])
        assert found and all(found)

    def test_trainable_mask_selects_reference_subset(self, key):
        cfg = self.small_cfg()
        params = sd_network_init(key, cfg)
        mask = trainable_mask(params)
        flat_p = jax.tree.leaves_with_path(params)
        flat_m = dict(jax.tree.leaves_with_path(mask))
        n_train, n_frozen = 0, 0
        for path, leaf in flat_p:
            m = flat_m[path]
            s = jax.tree_util.keystr(path)
            if m:
                n_train += 1
                assert ("image_proj" in s or "downsampling" in s
                        or "to_k_ip" in s or "to_v_ip" in s), s
            else:
                n_frozen += 1
                assert "_ip" not in s and "image_proj" not in s, s
        assert n_train > 0 and n_frozen > 0
