#!/usr/bin/env python
"""Per-level hash-gather cost vs table size on real TPU.

The exact-mode encode forward is ~300 ms of the 525 ms train step, all
XLA gather (2^18-budget step → 33.6M row gathers over 16 level tables).
VERDICT round 1 asks whether a VMEM-resident-coarse-levels Pallas encode
can beat it.  The decision hinges on whether XLA's gather is cheaper on
small (VMEM-sized, dense-level) tables: if per-item cost is flat in
table size, a kernel holding the coarse tables in VMEM has real
headroom; if small tables are already fast, it does not.

Measures gather of [M] random rows from [T, 2] f32 tables across
T = 2^12 … 2^19 at fixed M, plus the trilinear-weighted 8-corner
variant, plus bf16 tables.

Usage: python scripts/bench_gather_by_table.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _force(x):
    return jax.device_get(x[(0,) * x.ndim])


def timeit(fn, *args, n=20):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    M = 1 << 21                               # 2.1M gathers per level shape
    print(f"M = {M} row gathers; times in ms (per-item ns in parens)")
    for log2_t in (12, 14, 16, 17, 18, 19):
        T = 1 << log2_t
        table = jax.random.normal(key, (T, 2), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, log2_t), (M,), 0, T)

        @jax.jit
        def gather(table, idx):
            return table[idx]

        ms = timeit(gather, table, idx)
        print(f"  T=2^{log2_t:>2}: {ms:7.2f} ms  ({ms * 1e6 / M:5.1f} ns/item)")

    # 8-corner weighted form at the real encode's per-level load
    Mc = 1 << 18
    T = 1 << 19
    table = jax.random.normal(key, (T, 2), jnp.float32)
    idx8 = jax.random.randint(key, (Mc, 8), 0, T)
    w8 = jax.random.uniform(key, (Mc, 8, 1))

    @jax.jit
    def corner_gather(table, idx8, w8):
        return jnp.sum(table[idx8] * w8, axis=1)

    ms = timeit(corner_gather, table, idx8, w8)
    print(f"  8-corner trilinear T=2^19, M={Mc}: {ms:7.2f} ms "
          f"({ms * 1e6 / (Mc * 8):5.1f} ns/corner)")


if __name__ == "__main__":
    main()
