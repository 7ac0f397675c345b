"""hash_scatter_add fallback + custom-bwd hash encode equivalence (CPU).

The Pallas kernel itself requires a TPU; here we verify (a) the jnp
fallback is exact, (b) the custom-VJP encode path produces the same table
gradient as autodiff-through-gather, (c) padding/edge semantics of the
sorted packing helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.config import HashGridConfig
from stable_nerf_tpu.ops.encoding import hash_grid_encode, hash_grid_init
from stable_nerf_tpu.ops.pallas.scatter import hash_scatter_add


def test_fallback_matches_at_add(rng):
    T = 512
    idx = jnp.asarray(rng.integers(0, T, 1000), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(1000, 2)).astype(np.float32))
    out = hash_scatter_add(idx, upd, T, use_pallas=False)
    ref = jnp.zeros((T, 2)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_fallback_drops_out_of_range(rng):
    T = 64
    idx = jnp.asarray([0, 63, 64, 100], jnp.int32)   # 64, 100 out of range
    upd = jnp.ones((4, 2))
    out = hash_scatter_add(idx, upd, T, use_pallas=False)
    assert float(jnp.sum(out)) == 4.0                # only 2 valid entries × 2


def test_per_level_fallback_matches_flat(rng):
    from stable_nerf_tpu.ops.pallas.scatter import hash_scatter_add_per_level

    L, T, M, C, F = 4, 256, 500, 8, 2
    # per-level structured indices: idx[:, l, :] ∈ [l·T, (l+1)·T)
    local = rng.integers(0, T, (M, L, C)).astype(np.int32)
    idx = jnp.asarray(local + np.arange(L)[None, :, None] * T)
    upd = jnp.asarray(rng.normal(size=(M, L, C, F)).astype(np.float32))
    out = hash_scatter_add_per_level(idx, upd, L, T, use_pallas=False)
    ref = jnp.zeros((L * T, F)).at[idx.reshape(-1)].add(upd.reshape(-1, F))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_per_level_sorted_rows_concatenate_globally_sorted(rng):
    """The invariant the TPU path relies on: sorting each level's row and
    concatenating yields a globally sorted index array."""
    L, T, M, C = 4, 256, 100, 8
    local = rng.integers(0, T, (M, L, C)).astype(np.int32)
    idx = local + np.arange(L)[None, :, None] * T
    idx_l = idx.transpose(1, 0, 2).reshape(L, M * C)
    out = np.sort(idx_l, axis=1).reshape(-1)
    assert np.all(np.diff(out) >= 0)


def test_custom_bwd_encode_matches_autodiff(key):
    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(key, (64, 3))
    g_out = jax.random.normal(jax.random.fold_in(key, 1), (64, cfg.output_dim))

    def loss_auto(table):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=False)
        return jnp.sum(out * g_out)

    def loss_custom(table):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=True)
        return jnp.sum(out * g_out)

    # forwards identical
    np.testing.assert_allclose(float(loss_auto(params.table)),
                               float(loss_custom(params.table)), rtol=1e-6)
    g_a = jax.grad(loss_auto)(params.table)
    g_c = jax.grad(loss_custom)(params.table)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_a),
                               rtol=1e-4, atol=1e-6)


def test_custom_bwd_under_jit_and_batch_shapes(key):
    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(key, (4, 8, 3))

    @jax.jit
    def f(table):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=True)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(params.table)
    assert g.shape == params.table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_pack_unpack_bf16_pair_roundtrip(rng):
    from stable_nerf_tpu.ops.pallas.scatter import (
        pack_bf16_pair, unpack_bf16_pair,
    )

    u = jnp.asarray(rng.standard_normal((64, 2)).astype(np.float32)) * 10.0
    packed = pack_bf16_pair(u)
    assert packed.dtype == jnp.uint32
    got = unpack_bf16_pair(packed)
    want = np.asarray(u.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_per_level_payload_bf16_matches_rounded_dense(rng):
    """payload_bf16 must equal the dense scatter of bf16-rounded updates
    (only the pre-sum rounding differs from the exact path)."""
    from stable_nerf_tpu.ops.pallas.scatter import hash_scatter_add_per_level

    L, T, M, C, F = 3, 64, 50, 8, 2
    idx = np.stack(
        [rng.integers(l * T, (l + 1) * T, size=(M, C)) for l in range(L)],
        axis=1,
    ).astype(np.int32)
    upd = rng.standard_normal((M, L, C, F)).astype(np.float32)
    got = hash_scatter_add_per_level(jnp.asarray(idx), jnp.asarray(upd), L, T,
                                     use_pallas=False, payload_bf16=True)
    rounded = np.asarray(
        jnp.asarray(upd).astype(jnp.bfloat16).astype(jnp.float32))
    want = np.zeros((L * T, F), np.float32)
    np.add.at(want, idx.reshape(-1), rounded.reshape(-1, F))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_grad_bf16_encode_close_to_exact(key):
    """End-to-end: grad_bf16 custom backward stays within bf16 rounding of
    the exact custom backward."""
    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=8, base_resolution=4)
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (32, 3))

    def loss(table, grad_bf16):
        from stable_nerf_tpu.ops.encoding import HashGridParams
        out = hash_grid_encode(HashGridParams(table), x, cfg,
                               custom_bwd=True, grad_bf16=grad_bf16)
        return jnp.sum(jnp.sin(out) ** 2)

    g_exact = jax.grad(lambda t: loss(t, False))(params.table)
    g_bf16 = jax.grad(lambda t: loss(t, True))(params.table)
    denom = np.maximum(np.abs(np.asarray(g_exact)), 1e-3)
    rel = np.abs(np.asarray(g_bf16 - g_exact)) / denom
    assert rel.max() < 2e-2, rel.max()
