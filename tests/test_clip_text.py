"""CLIP text encoder parity tests against torch transformers (random weights).

The strongest correctness oracle available offline: build a torch
CLIPTextModel with a small random config, convert its state_dict, and demand
near-bit-equal hidden states and pooled outputs."""

import numpy as np
import pytest

import jax.numpy as jnp

from stable_nerf_tpu.models.diffusion.clip_text import (
    CLIPTextConfig,
    clip_l_config,
    clip_text_apply,
    clip_text_init,
    empty_prompt_ids,
    encode_prompt_sdxl,
    open_clip_bigg_config,
    params_from_hf_state_dict,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def small_cfg(**kw):
    base = dict(vocab_size=1000, hidden_size=64, num_layers=3, num_heads=4,
                intermediate_size=128, max_positions=77)
    base.update(kw)
    return CLIPTextConfig(**base)


def hf_model(cfg: CLIPTextConfig, with_projection=False, seed=0):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_positions, hidden_act=cfg.hidden_act,
        projection_dim=cfg.projection_dim or cfg.hidden_size,
        eos_token_id=cfg.eos_token_id, bos_token_id=cfg.bos_token_id,
    )
    torch.manual_seed(seed)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    return cls(hf_cfg).eval()


class TestParityWithTorch:
    @pytest.mark.slow
    def test_hidden_states_match(self):
        cfg = small_cfg()
        model = hf_model(cfg)
        params = params_from_hf_state_dict(model.state_dict(), cfg)
        ids = np.random.default_rng(0).integers(0, 900, (2, 77)).astype(np.int32)
        ids[:, -1] = 999  # make argmax-eos well-defined

        with torch.no_grad():
            out_t = model(torch.tensor(ids.astype(np.int64)),
                          output_hidden_states=True)
        out_j = clip_text_apply(params, jnp.asarray(ids), cfg)

        np.testing.assert_allclose(
            np.asarray(out_j["last_hidden_state"]),
            out_t.last_hidden_state.numpy(), atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["penultimate"]),
            out_t.hidden_states[-2].numpy(), atol=2e-5,
        )

    def test_pooled_with_projection_matches(self):
        cfg = small_cfg(hidden_act="gelu", projection_dim=32, pad_token_id=0,
                        eos_token_id=999, bos_token_id=998)
        model = hf_model(cfg, with_projection=True)
        params = params_from_hf_state_dict(model.state_dict(), cfg)
        ids = np.zeros((1, 77), np.int32)
        ids[0, 0] = cfg.bos_token_id
        ids[:, 1] = cfg.eos_token_id   # eos at position 1
        with torch.no_grad():
            out_t = model(torch.tensor(ids.astype(np.int64)))
        out_j = clip_text_apply(params, jnp.asarray(ids), cfg)
        np.testing.assert_allclose(
            np.asarray(out_j["pooled"]), out_t.text_embeds.numpy(), atol=2e-5
        )


class TestSDXLPromptPath:
    def test_encode_prompt_shapes(self, key):
        import jax
        cfg1 = small_cfg()
        cfg2 = small_cfg(hidden_size=96, num_heads=6, hidden_act="gelu",
                         projection_dim=96, pad_token_id=0)
        k1, k2 = jax.random.split(key)
        p1 = clip_text_init(k1, cfg1)
        p2 = clip_text_init(k2, cfg2)
        ids1 = empty_prompt_ids(cfg1) % cfg1.vocab_size
        ids2 = empty_prompt_ids(cfg2) % cfg2.vocab_size
        embeds, pooled = encode_prompt_sdxl(p1, p2, ids1, ids2, cfg1, cfg2)
        assert embeds.shape == (1, 77, 64 + 96)
        assert pooled.shape == (1, 96)

    def test_empty_prompt_ids_structure(self):
        ids = np.asarray(empty_prompt_ids(clip_l_config(), batch=2))
        assert ids.shape == (2, 77)
        assert ids[0, 0] == 49406 and ids[0, 1] == 49407
        assert np.all(ids[:, 2:] == 49407)          # CLIP-L pads with eos
        ids2 = np.asarray(empty_prompt_ids(open_clip_bigg_config()))
        assert np.all(ids2[:, 2:] == 0)             # bigG pads with 0


class TestFullPromptAPI:
    def test_encode_prompt_four_tuple(self, key):
        import jax
        from stable_nerf_tpu.models.diffusion.clip_text import (
            encode_prompt, make_empty_prompt_conditioning)
        cfg1 = small_cfg()
        cfg2 = small_cfg(hidden_size=96, num_heads=6, hidden_act="gelu",
                         projection_dim=96, pad_token_id=0)
        k1, k2 = jax.random.split(key)
        p1, p2 = clip_text_init(k1, cfg1), clip_text_init(k2, cfg2)
        ids1 = empty_prompt_ids(cfg1) % cfg1.vocab_size
        ids2 = empty_prompt_ids(cfg2) % cfg2.vocab_size
        pe, ne, pp, np_ = encode_prompt(p1, p2, ids1, ids2, ids1, ids2,
                                        cfg1, cfg2)
        assert pe.shape == ne.shape == (1, 77, 64 + 96)
        assert pp.shape == np_.shape == (1, 96)
        np.testing.assert_allclose(np.asarray(pe), np.asarray(ne))

    def test_empty_prompt_conditioning(self, key):
        import jax
        from stable_nerf_tpu.models.diffusion.clip_text import (
            make_empty_prompt_conditioning)
        cfg1 = small_cfg(eos_token_id=999, bos_token_id=998, pad_token_id=999)
        cfg2 = small_cfg(hidden_size=96, num_heads=6, hidden_act="gelu",
                         projection_dim=96, pad_token_id=0,
                         eos_token_id=999, bos_token_id=998)
        k1, k2 = jax.random.split(key)
        p1, p2 = clip_text_init(k1, cfg1), clip_text_init(k2, cfg2)
        pe, pooled, tids = make_empty_prompt_conditioning(p1, p2, cfg1, cfg2)
        assert pe.shape == (1, 77, 64 + 96)
        assert pooled.shape == (1, 96)
        np.testing.assert_allclose(
            np.asarray(tids), [[1024., 1024., 0., 0., 1024., 1024.]])


class TestEmptyPromptPipelineTorchParity:
    """The full init_empty_prompts pipeline vs the torch reference path
    (reference stable_diffusion/network.py:114-168 → utils/sd_utils.py):
    converted random torch weights → make_empty_prompt_conditioning must be
    bit-close to the torch dual-encoder computation and non-zero."""

    def test_empty_prompt_conditioning_matches_torch(self):
        # vocab must contain the real bos/eos ids so "" tokenizes normally
        cfg1 = small_cfg(vocab_size=49408)
        cfg2 = small_cfg(vocab_size=49408, hidden_size=96, num_heads=6,
                         hidden_act="gelu", projection_dim=96, pad_token_id=0)
        m1 = hf_model(cfg1, seed=0)
        m2 = hf_model(cfg2, with_projection=True, seed=1)
        p1 = params_from_hf_state_dict(m1.state_dict(), cfg1)
        p2 = params_from_hf_state_dict(m2.state_dict(), cfg2)

        from stable_nerf_tpu.models.diffusion.clip_text import (
            make_empty_prompt_conditioning,
        )

        prompt_embeds, pooled, time_ids = make_empty_prompt_conditioning(
            p1, p2, cfg1, cfg2)

        ids1 = np.asarray(empty_prompt_ids(cfg1)).astype(np.int64)
        ids2 = np.asarray(empty_prompt_ids(cfg2)).astype(np.int64)
        with torch.no_grad():
            out1 = m1(torch.tensor(ids1), output_hidden_states=True)
            out2 = m2(torch.tensor(ids2), output_hidden_states=True)
        expect_embeds = np.concatenate(
            [out1.hidden_states[-2].numpy(), out2.hidden_states[-2].numpy()],
            axis=-1)
        expect_pooled = out2.text_embeds.numpy()

        np.testing.assert_allclose(np.asarray(prompt_embeds), expect_embeds,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(pooled), expect_pooled,
                                   atol=2e-5)
        assert float(np.abs(expect_pooled).max()) > 0  # non-zero conditioning
        np.testing.assert_allclose(
            np.asarray(time_ids), [[1024., 1024., 0., 0., 1024., 1024.]])

    def test_load_sdxl_text_towers(self, tmp_path):
        """load_sdxl picks up text_encoder/ and text_encoder_2/ dirs and the
        converted towers drive make_empty_prompt_conditioning (the loop's
        pretrained-init path)."""
        import jax
        from stable_nerf_tpu.models.diffusion.weights import load_sdxl
        from tests.test_weights import (
            TINY_VAE, _vae_state_dict, unet_state_dict_from_params,
        )
        from stable_nerf_tpu.models.diffusion.unet import (
            tiny_unet_config, unet_init,
        )

        rng = np.random.default_rng(0)
        cfg1 = small_cfg(vocab_size=49408)
        cfg2 = small_cfg(vocab_size=49408, hidden_size=96, num_heads=6,
                         hidden_act="gelu", projection_dim=96, pad_token_id=0)
        m1 = hf_model(cfg1, seed=0)
        m2 = hf_model(cfg2, with_projection=True, seed=1)

        root = tmp_path / "sdxl"
        for sub in ("vae", "unet", "text_encoder", "text_encoder_2"):
            (root / sub).mkdir(parents=True)
        def as_torch(sd):
            return {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}

        torch.save(as_torch(_vae_state_dict(rng)), root / "vae" /
                   "diffusion_pytorch_model.bin")
        unet_sd = unet_state_dict_from_params(
            unet_init(jax.random.PRNGKey(0), tiny_unet_config(),
                      with_ip=False))
        torch.save(as_torch(unet_sd), root / "unet" /
                   "diffusion_pytorch_model.bin")
        torch.save(m1.state_dict(), root / "text_encoder" /
                   "pytorch_model.bin")
        torch.save(m2.state_dict(), root / "text_encoder_2" /
                   "pytorch_model.bin")

        loaded = load_sdxl(str(root), unet_cfg=tiny_unet_config(),
                           vae_cfg=TINY_VAE, text_cfg_1=cfg1,
                           text_cfg_2=cfg2)
        assert set(loaded) == {"vae", "unet", "text_encoder",
                               "text_encoder_2"}

        from stable_nerf_tpu.models.diffusion.clip_text import (
            make_empty_prompt_conditioning,
        )

        _, pooled, _ = make_empty_prompt_conditioning(
            loaded["text_encoder"], loaded["text_encoder_2"], cfg1, cfg2)
        assert pooled.shape == (1, 96)
        assert float(np.abs(np.asarray(pooled)).max()) > 0
