#!/usr/bin/env python
"""Hash-table storage dtype study: f32 vs bf16 vs packed-u32 gather rows.

tcnn stores its hash tables in fp16 (reference nerf/network.py:23-26 via
tiny-cuda-nn); our table is f32.  The exact-mode encode is gather-bound
at XLA's floor (ARCHITECTURE.md encode study), and a [2^19, 2] f32 level
slice is 4 MiB — bf16 halves both the bytes moved per corner row and the
working set (2 MiB/level), which matters exactly in the regime where the
per-table-size study saw cache cliffs (2^18–2^19).

Variants measured at the production shape (M=2^18 samples, 16 levels,
8 corners = 33.6M corner rows):
  * f32 per-level gathers (production path today)
  * bf16 per-level gathers (table cast once outside the loop — in a train
    step the cast is once per step, ~0.5 ms for the 67 MB table)
  * packed: the two bf16 features bitcast into one u32 per row → gather
    moves [T] u32 scalars instead of [T, 2] rows
  * the same three at the stochastic one-corner shape (C=1, flat gather)

Scan-amortized timing (axon RPC ~1 ms/dispatch); scalar device_get to
force completion.

Usage: python scripts/bench_table_dtype.py
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


def timeit_scanned(fn, *args, iters=10):
    """Perturb the first operand each step so XLA cannot hoist the body."""

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


def encode_split(table, flat_idx, cw, cfg):
    """Per-level gathers over [table_size, F] slices (production exact path)."""
    M, L, C = flat_idx.shape
    F = cfg.n_features_per_level
    tables = table.reshape(L, cfg.table_size, F)
    outs = []
    for lv in range(L):
        local = flat_idx[:, lv, :] - lv * cfg.table_size      # [M, C]
        feats = tables[lv][local.reshape(-1)].reshape(M, C, F)
        outs.append(jnp.sum(feats * cw[:, lv], axis=1))
    return jnp.concatenate(outs, axis=-1)


def encode_split_packed(packed, flat_idx, cw, cfg):
    """Per-level gathers of u32-packed bf16 feature pairs ([T] u32 rows)."""
    M, L, C = flat_idx.shape
    tables = packed.reshape(L, cfg.table_size)
    outs = []
    for lv in range(L):
        local = flat_idx[:, lv, :] - lv * cfg.table_size      # [M, C]
        rows = tables[lv][local.reshape(-1)]                  # [M*C] u32
        feats = jax.lax.bitcast_convert_type(
            rows, jnp.bfloat16).reshape(M, C, 2)              # [M, C, 2]
        outs.append(jnp.sum(feats * cw[:, lv], axis=1))
    return jnp.concatenate(outs, axis=-1)


def encode_flat(table, flat_idx, cw, cfg):
    """Single flat gather (production stochastic path)."""
    M, L, C = flat_idx.shape
    F = cfg.n_features_per_level
    feats = table[flat_idx.reshape(-1)].reshape(M, L, C, F)
    return jnp.sum(feats * cw, axis=2).reshape(M, L * F)


def encode_flat_packed(packed, flat_idx, cw, cfg):
    M, L, C = flat_idx.shape
    rows = packed[flat_idx.reshape(-1)]
    feats = jax.lax.bitcast_convert_type(
        rows, jnp.bfloat16).reshape(M, L, C, 2)
    return jnp.sum(feats * cw, axis=2).reshape(M, L * 2)


def pack_bf16(table):
    """[N, 2] f32 → [N] u32 with both bf16 features in one word."""
    b = table.astype(jnp.bfloat16)                            # [N, 2]
    return jax.lax.bitcast_convert_type(b, jnp.uint32)[..., 0] \
        if b.ndim == 3 else jax.lax.bitcast_convert_type(
            b.reshape(-1, 2), jnp.uint32).reshape(table.shape[0])


def main():
    cfg = HashGridConfig()
    key = jax.random.PRNGKey(0)
    params = hash_grid_init(key, cfg)
    M = 1 << 18
    x = jax.random.uniform(jax.random.fold_in(key, 1), (M, 3))

    table_f32 = params.table
    table_bf16 = jax.jit(lambda t: t.astype(jnp.bfloat16))(table_f32)
    table_packed = jax.jit(pack_bf16)(table_f32)
    jax.block_until_ready((table_bf16, table_packed))

    for stoch, label in ((False, "exact 8-corner"), (True, "stochastic C=1")):
        flat_idx, cw = jax.jit(
            lambda y: _indices_weights(y, cfg, stoch))(x)
        flat_idx = jax.block_until_ready(flat_idx)
        enc = encode_flat if stoch else encode_split
        enc_packed = encode_flat_packed if stoch else encode_split_packed

        t_f32 = timeit_scanned(
            lambda t, fi, w: enc(t, fi, w, cfg), table_f32, flat_idx, cw)
        t_bf16 = timeit_scanned(
            lambda t, fi, w: enc(t, fi, w, cfg), table_bf16, flat_idx, cw)
        t_pack = timeit_scanned(
            lambda t, fi, w: enc_packed(t, fi, w, cfg),
            table_packed, flat_idx, cw)
        print(f"[{label}] f32: {t_f32:7.2f} ms   bf16: {t_bf16:7.2f} ms   "
              f"packed-u32: {t_pack:7.2f} ms")

    # cost of the once-per-step cast/pack of the full 16·2^19 table
    t_cast = timeit_scanned(lambda t: t.astype(jnp.bfloat16), table_f32)
    t_pack1 = timeit_scanned(pack_bf16, table_f32)
    print(f"[cast overhead] f32→bf16: {t_cast:.2f} ms   pack-u32: {t_pack1:.2f} ms")


if __name__ == "__main__":
    main()
