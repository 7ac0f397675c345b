"""Static-budget sample compaction.

The reference's CUDA march writes only occupied samples into a compacted
buffer whose size is the running ``mean_count`` (raymarching.py:198-203),
randomly dropping rays when the estimate is exceeded.  The TPU equivalent:
keep the fixed ``[N, K]`` lattice for compositing, but evaluate the expensive
NeRF network only on the valid samples, packed front-first into a *static*
``budget``-sized buffer via a cumsum partition (no sort, no atomics, O(NK)).

Valid samples beyond the budget are dropped (mask cleared) — the same
semantics as the reference's mean_count overflow drop, but deterministic.

Differentiability: gather/scatter are jnp index ops, so gradients flow from
the composited loss back through ``scatter_back`` → network eval →
``gather`` into the hash table untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Compaction(NamedTuple):
    src_idx: jnp.ndarray     # [budget] flat source index, == NK for unused slots
    slot_used: jnp.ndarray   # [budget] bool
    new_valid: jnp.ndarray   # [N, K] valid mask minus over-budget drops
    n_valid: jnp.ndarray     # scalar int32: number of used slots


def compact_plan(valid, budget: int) -> Compaction:
    """Build the pack/unpack plan for a [N, K] validity mask."""
    N, K = valid.shape
    NK = N * K
    flat = valid.reshape(-1)
    cnt = jnp.cumsum(flat.astype(jnp.int32))
    total = cnt[-1]
    dest = jnp.where(flat, cnt - 1, budget)
    dest = jnp.minimum(dest, budget)                       # trash slot
    src = jnp.full((budget + 1,), NK, jnp.int32).at[dest].set(
        jnp.arange(NK, dtype=jnp.int32), mode="drop"
    )
    src_idx = src[:budget]
    n_valid = jnp.minimum(total, budget)
    slot_used = jnp.arange(budget, dtype=jnp.int32) < n_valid
    new_valid = (flat & ((cnt - 1) < budget)).reshape(N, K)
    return Compaction(src_idx, slot_used, new_valid, n_valid)


def gather_compact(plan: Compaction, x):
    """Pack x [N, K, ...] (or [NK, ...]) into [budget, ...]; unused slots 0."""
    leading = x.shape
    if x.ndim >= 2:
        nk = leading[0] * leading[1]
        flat = x.reshape((nk,) + x.shape[2:]) if x.ndim > 2 else x.reshape(nk)
    else:
        flat = x
    safe = jnp.minimum(plan.src_idx, flat.shape[0] - 1)
    out = flat[safe]
    mask_shape = (plan.src_idx.shape[0],) + (1,) * (out.ndim - 1)
    return out * plan.slot_used.reshape(mask_shape).astype(out.dtype)


def scatter_back(plan: Compaction, values, nk: int):
    """Unpack [budget, ...] back to flat [NK, ...]; dropped samples get 0."""
    idx = jnp.where(plan.slot_used, plan.src_idx, nk)
    out_shape = (nk,) + values.shape[1:]
    return jnp.zeros(out_shape, values.dtype).at[idx].set(values, mode="drop")
