"""CLIP vision encoder parity vs torch transformers (random weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stable_nerf_tpu.models.diffusion.clip_vision import (
    CLIPVisionConfig,
    clip_encode_images,
    clip_resize,
    clip_vision_apply,
    clip_vision_init,
    clip_vision_params_from_hf,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def small_cfg():
    return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                            num_layers=2, num_heads=4, intermediate_size=128,
                            projection_dim=48)


def hf_model(cfg, seed=0):
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        projection_dim=cfg.projection_dim, hidden_act=cfg.hidden_act,
    )
    torch.manual_seed(seed)
    return transformers.CLIPVisionModelWithProjection(hf_cfg).eval()


def test_parity_with_torch(rng):
    cfg = small_cfg()
    model = hf_model(cfg)
    params = clip_vision_params_from_hf(model.state_dict(), cfg)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.tensor(x))
    out_j = clip_vision_apply(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out_j["image_embeds"]),
                               out_t.image_embeds.numpy(), atol=3e-5)


def test_encode_images_resizes(key, rng):
    import jax
    cfg = small_cfg()
    params = clip_vision_init(key, cfg)
    imgs = jnp.asarray(rng.normal(size=(1, 3, 64, 64)).astype(np.float32))
    emb = clip_encode_images(params, imgs, cfg)
    assert emb.shape == (1, 48)


def test_clip_resize_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 50, 70)).astype(np.float32))
    assert clip_resize(x, 32).shape == (2, 3, 32, 32)
