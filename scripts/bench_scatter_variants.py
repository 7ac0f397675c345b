#!/usr/bin/env python
"""Microbenchmark: hash-gradient scatter/gather variants on real TPU.

Races, at the reference workload shape (33.5M updates into a 2^19-entry
16-level table, F=2 — SURVEY §7's hard part):

  * XLA scatter-add (the .at[].add baseline)
  * v1 sorted-block scatter (flat one-hot, block=1024)
  * v2 sorted-block scatter (radix hi/lo one-hot, block=4096)
  * lax.sort alone (to know how much of the sorted kernels is the sort)
  * XLA flat gather (the forward-path baseline it must eventually beat)

Usage: python scripts/bench_scatter_variants.py [--m 33554432]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _force(out):
    """Force completion with a host readout — on the axon platform
    block_until_ready on device-resident outputs under-reports (ROUND1
    notes); a scalar device_get does not."""
    for leaf in jax.tree.leaves(out):
        np_leaf = jax.device_get(leaf[(0,) * leaf.ndim])
    return np_leaf


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        _force(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2 ** 18 * 16 * 8)
    ap.add_argument("--table", type=int, default=2 ** 19 * 16)
    ap.add_argument("--feat", type=int, default=2)
    ap.add_argument("--check", action="store_true",
                    help="small-size correctness check vs XLA scatter")
    args = ap.parse_args()

    from stable_nerf_tpu.ops.pallas.scatter import sorted_block_scatter_add
    from stable_nerf_tpu.ops.pallas.scatter_v2 import (
        sorted_block_scatter_add_v2,
    )

    key = jax.random.PRNGKey(0)
    M, T, F = args.m, args.table, args.feat

    if args.check:
        Mc, Tc = 40000, 8192
        idx = jax.random.randint(key, (Mc,), 0, Tc, jnp.int32)
        upd = jax.random.normal(jax.random.fold_in(key, 1), (Mc, F))
        ref = jnp.zeros((Tc, F)).at[idx].add(upd)
        ops = jax.lax.sort([idx] + [upd[:, f] for f in range(F)], num_keys=1)
        sidx, supd = ops[0], jnp.stack(ops[1:], axis=-1)
        for name, fn in [("v1", sorted_block_scatter_add),
                         ("v2", sorted_block_scatter_add_v2)]:
            out = fn(sidx, supd, Tc)
            err = float(jnp.max(jnp.abs(out - ref)) /
                        (jnp.max(jnp.abs(ref)) + 1e-30))
            print(f"correctness {name}: max rel err {err:.2e}")
        return

    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    upd = jax.random.normal(jax.random.fold_in(key, 1), (M, F), jnp.float32)

    # --- sort alone ---------------------------------------------------
    @jax.jit
    def do_sort(idx, upd):
        ops = jax.lax.sort([idx] + [upd[:, f] for f in range(F)], num_keys=1)
        return ops[0], jnp.stack(ops[1:], axis=-1)

    dt, (sidx, supd) = timeit(do_sort, idx, upd, n=3)
    print(f"lax.sort {M/1e6:.1f}M:            {dt*1e3:8.1f} ms")

    # --- XLA scatter baseline ----------------------------------------
    @jax.jit
    def xla_scatter(idx, upd):
        return jnp.zeros((T, F), jnp.float32).at[idx].add(upd, mode="drop")

    dt, ref = timeit(xla_scatter, idx, upd, n=1)
    print(f"XLA scatter-add:           {dt*1e3:8.1f} ms")

    # --- v1 / v2 sorted-block kernels (sorted input, kernel only) ----
    for name, fn in [("v1 kernel (block 1024)", sorted_block_scatter_add),
                     ("v2 kernel (radix 4096)", sorted_block_scatter_add_v2)]:
        dt, out = timeit(lambda s, u: fn(s, u, T), sidx, supd, n=3)
        err = float(jnp.max(jnp.abs(out - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-30))
        print(f"{name}:    {dt*1e3:8.1f} ms   (max rel err {err:.2e})")

    # --- end-to-end (sort + kernel) ----------------------------------
    for name, fn in [("v1 sort+kernel", sorted_block_scatter_add),
                     ("v2 sort+kernel", sorted_block_scatter_add_v2)]:
        @jax.jit
        def e2e(idx, upd, fn=fn):
            ops = jax.lax.sort([idx] + [upd[:, f] for f in range(F)],
                               num_keys=1)
            return fn(ops[0], jnp.stack(ops[1:], axis=-1), T)

        dt, _ = timeit(e2e, idx, upd, n=3)
        print(f"{name}:            {dt*1e3:8.1f} ms")

    # --- batched per-level sort (16 independent 1/16-size sorts) -----
    L = 16
    if M % L == 0:
        @jax.jit
        def do_sort_batched(idx, upd):
            i2 = idx.reshape(L, M // L)
            u2 = upd.reshape(L, M // L, F)
            ops = jax.lax.sort(
                [i2] + [u2[..., f] for f in range(F)], num_keys=1,
                dimension=1,
            )
            return ops[0], jnp.stack(ops[1:], axis=-1)

        dt, _ = timeit(do_sort_batched, idx, upd, n=3)
        print(f"lax.sort batched [16, {M//L/1e6:.1f}M]: {dt*1e3:8.1f} ms")

    # --- batched sort with bf16-packed payload (2 operands) ----------
    if M % L == 0 and F == 2:
        from stable_nerf_tpu.ops.pallas.scatter import (
            pack_bf16_pair, unpack_bf16_pair,
        )

        @jax.jit
        def do_sort_packed(idx, upd):
            i2 = idx.reshape(L, M // L)
            packed = pack_bf16_pair(upd.reshape(L, M // L, F))
            si, sp = jax.lax.sort([i2, packed], num_keys=1, dimension=1)
            return si, unpack_bf16_pair(sp)

        dt, _ = timeit(do_sort_packed, idx, upd, n=3)
        print(f"lax.sort batched, bf16-packed payload: {dt*1e3:6.1f} ms")

    # --- XLA gather (forward baseline) -------------------------------
    table = jax.random.normal(key, (T, F), jnp.float32)

    @jax.jit
    def xla_gather(table, idx):
        return table[idx]

    dt, _ = timeit(xla_gather, table, idx, n=3)
    print(f"XLA gather {M/1e6:.1f}M rows:     {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
