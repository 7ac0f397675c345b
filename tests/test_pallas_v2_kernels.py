"""Interpret-mode correctness for the radix-decomposed Pallas kernels.

Runs the v2 sorted-block scatter (ops/pallas/scatter_v2.py) and the
sorted-window gather (ops/pallas/gather.py) through the Pallas
interpreter on CPU against XLA references.  The kernels' TPU performance
is benchmarked separately (scripts/bench_scatter_variants.py); these
tests pin the semantics: block/window boundary handling, padding,
multi-chunk spans, and the hi/lo-split accuracy contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.ops.pallas.gather import sorted_window_gather
from stable_nerf_tpu.ops.pallas.scatter_v2 import sorted_block_scatter_add_v2


def _sorted(idx, upd):
    ops = jax.lax.sort([idx] + [upd[:, f] for f in range(upd.shape[1])],
                       num_keys=1)
    return ops[0], jnp.stack(ops[1:], axis=-1)


def test_scatter_v2_matches_xla(key):
    T, F, M = 8192, 2, 3000
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    upd = jax.random.normal(jax.random.fold_in(key, 1), (M, F), jnp.float32)
    sidx, supd = _sorted(idx, upd)
    ref = jnp.zeros((T, F)).at[idx].add(upd)
    out = sorted_block_scatter_add_v2(sidx, supd, T, interpret=True)
    # hi/lo bf16-split contract: small relative error on accumulated sums
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
    # untouched rows exactly zero
    touched = np.zeros(T, bool)
    touched[np.asarray(idx)] = True
    assert np.all(np.asarray(out)[~touched] == 0.0)


def test_scatter_v2_hot_row_and_padding(key):
    """All updates into one row (crosses many windows within one block) +
    padding indices (>= table_size) dropped."""
    T, F = 4096, 2
    M = 4000
    idx = jnp.concatenate([
        jnp.full((M - 100,), 77, jnp.int32),          # hot row
        jnp.full((100,), T, jnp.int32),               # padding → dropped
    ])
    upd = jnp.ones((M, F), jnp.float32)
    out = sorted_block_scatter_add_v2(idx, upd, T, interpret=True)
    np.testing.assert_allclose(float(out[77, 0]), M - 100, rtol=1e-3)
    assert float(jnp.sum(out)) == pytest.approx((M - 100) * F, rel=1e-3)


def test_scatter_v2_block_boundaries():
    """Indices straddling the 4096-entry block boundary land correctly."""
    T, F = 8192, 2
    idx = jnp.asarray([0, 4095, 4096, 4097, 8191], jnp.int32)
    upd = jnp.arange(10, dtype=jnp.float32).reshape(5, F)
    out = sorted_block_scatter_add_v2(idx, upd, T, interpret=True)
    for i, t in enumerate([0, 4095, 4096, 4097, 8191]):
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(upd[i]),
                                   atol=1e-2)


def test_gather_matches_table_rows(key):
    T, F, M = 8192, 2, 3000
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jnp.sort(jax.random.randint(jax.random.fold_in(key, 1), (M,), 0, T,
                                      jnp.int32))
    out = sorted_window_gather(table, idx, interpret=True)
    ref = table.astype(jnp.bfloat16).astype(jnp.float32)[idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_wide_span_multi_chunk(key):
    """A window whose indices span many 4096-entry chunks exercises the
    chunk loop."""
    T, F = 32768, 2
    table = jax.random.normal(key, (T, F), jnp.float32)
    # 1024 indices spread across the whole table → span ≫ one chunk
    idx = jnp.sort((jnp.arange(1024, dtype=jnp.int32) * 31) % T)
    out = sorted_window_gather(table, idx, interpret=True)
    ref = table.astype(jnp.bfloat16).astype(jnp.float32)[idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_duplicate_and_edge_indices(key):
    T, F = 8192, 2
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jnp.asarray([0, 0, 0, 1, 4095, 4096, 8191, 8191], jnp.int32)
    out = sorted_window_gather(table, idx, interpret=True)
    ref = table.astype(jnp.bfloat16).astype(jnp.float32)[idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
