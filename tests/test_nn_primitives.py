"""nn.py primitives cross-checked against torch functional equivalents —
the offline substitute for diffusers golden outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_nerf_tpu.models.diffusion.nn import (
    conv2d,
    group_norm,
    layer_norm,
    sdpa,
    silu,
    split_heads,
    merge_heads,
    timestep_embedding,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def test_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    ours = conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                  jnp.asarray(x), stride=1, padding=1)
    theirs = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                      stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_conv2d_stride2_matches_torch(rng):
    x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    w = rng.normal(size=(8, 4, 4, 4)).astype(np.float32)
    b = np.zeros(8, np.float32)
    ours = conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                  jnp.asarray(x), stride=2, padding=1)
    theirs = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                      stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_group_norm_matches_torch(rng):
    x = rng.normal(size=(2, 16, 8, 8)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    ours = group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                      jnp.asarray(x), groups=4, eps=1e-6)
    theirs = F.group_norm(torch.tensor(x), 4, torch.tensor(scale),
                          torch.tensor(bias), eps=1e-6)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(2, 7, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    ours = layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                      jnp.asarray(x))
    theirs = F.layer_norm(torch.tensor(x), (32,), torch.tensor(scale),
                          torch.tensor(bias), eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_sdpa_matches_torch(rng):
    q = rng.normal(size=(2, 4, 9, 16)).astype(np.float32)
    k = rng.normal(size=(2, 4, 7, 16)).astype(np.float32)
    v = rng.normal(size=(2, 4, 7, 16)).astype(np.float32)
    ours = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    theirs = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_silu_matches_torch(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(silu(jnp.asarray(x))),
                               F.silu(torch.tensor(x)).numpy(), atol=1e-6)


def test_split_merge_heads_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(merge_heads(split_heads(x, 4))),
                               np.asarray(x))


def test_timestep_embedding_properties():
    """diffusers get_timestep_embedding with flip_sin_to_cos: first half cos,
    second half sin; t=0 → (1…1, 0…0)."""
    emb = timestep_embedding(jnp.asarray([0.0]), 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)
    emb = timestep_embedding(jnp.asarray([100.0]), 8)
    # freqs: exp(-ln(1e4)·i/4) for i in 0..3 → args 100·freqs
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4.0)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.cos(100 * freqs),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.sin(100 * freqs),
                               atol=1e-4)
