#!/usr/bin/env python
"""Exact-mode hash-encode forward: one flat gather vs per-level gathers.

The encode gathers [M, 16, 8] corner rows from a single concatenated
[16·2^19, 2] table.  Hypothesis: per-level gathers (16 gathers of
[M, 8] from [2^19, 2] slices) let XLA pick cheaper lowerings for the
coarse dense levels whose working set is cache-sized.  Scan-amortized
timing (axon RPC overhead ~1 ms/dispatch).

Usage: python scripts/bench_encode_split.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stable_nerf_tpu.config import HashGridConfig
from stable_nerf_tpu.ops.encoding import _indices_weights, hash_grid_init


def _force(x):
    return jax.device_get(x[(0,) * x.ndim])


def timeit_scanned(fn, *args, iters=10):
    """The carry perturbs the first operand each step so XLA cannot hoist
    the (otherwise loop-invariant) body out of the scan."""

    @jax.jit
    def run(first, *rest):
        def body(acc, _):
            out = fn(first + acc.astype(first.dtype), *rest)
            return jnp.float32(1e-12) * out.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    jax.device_get(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def encode_flat(table, flat_idx, cw, cfg):
    """One gather from the concatenated [L·T, F] table (the round-1 path;
    the production encode now uses per-level gathers — see encode_split)."""
    M, L, C = flat_idx.shape
    feats = table[flat_idx.reshape(-1)]
    feats = feats.reshape(M, L, C, cfg.n_features_per_level)
    return jnp.sum(feats * cw, axis=2).reshape(M, L * cfg.n_features_per_level)


def encode_split(table, flat_idx, cw, cfg):
    """Per-level gathers over [table_size, F] slices."""
    M, L, C = flat_idx.shape
    F = cfg.n_features_per_level
    tables = table.reshape(L, cfg.table_size, F)
    outs = []
    for lv in range(L):
        local = flat_idx[:, lv, :] - lv * cfg.table_size      # [M, 8]
        feats = tables[lv][local.reshape(-1)].reshape(M, C, F)
        outs.append(jnp.sum(feats * cw[:, lv], axis=1))
    return jnp.concatenate(outs, axis=-1)


def main():
    cfg = HashGridConfig()
    key = jax.random.PRNGKey(0)
    params = hash_grid_init(key, cfg)
    M = 1 << 18
    x = jax.random.uniform(jax.random.fold_in(key, 1), (M, 3))
    flat_idx, cw = jax.jit(
        lambda x: _indices_weights(x, cfg, False))(x)
    flat_idx = jax.block_until_ready(flat_idx)

    t_flat = timeit_scanned(
        lambda t, fi, w: encode_flat(t, fi, w, cfg),
        params.table, flat_idx, cw)
    print(f"flat gather   [M={M}, 16 lv, 8 corners]: {t_flat:7.2f} ms")
    t_split = timeit_scanned(
        lambda t, fi, w: encode_split(t, fi, w, cfg),
        params.table, flat_idx, cw)
    print(f"per-level gathers:                        {t_split:7.2f} ms")

    # and the full encode incl. index/weight computation
    from stable_nerf_tpu.ops.encoding import HashGridParams, hash_grid_encode
    t_full = timeit_scanned(
        lambda t, y: hash_grid_encode(HashGridParams(table=t), y, cfg),
        params.table, x)
    print(f"full encode (indices + flat gather):      {t_full:7.2f} ms")


if __name__ == "__main__":
    main()
