"""Pallas TPU scatter-add for hash-table gradients.

Why: XLA's TPU scatter-add costs ~50-60 ns per update regardless of
sorted/unique hints (measured on v5e; see ARCHITECTURE.md) — at the
reference workload's ~16-33M updates/step into the 2^19-entry hash levels
that is ~1-2 s and dominates the NeRF backward (the hard part predicted by
SURVEY.md §7).

Approach ("sorted block accumulate"): sort updates by table index once
(multi-operand `lax.sort`), then a Pallas kernel walks table blocks; each
block streams its update range from HBM in lane-aligned [8, 128] windows
and accumulates with an iota-compare one-hot contraction per row:

    onehot[j, l] = (j == idx_row[l] − block_start)     # [block, 128]
    acc[f, :]   += upd_row_f [1, 128] · onehotᵀ        # dot_general A@Bᵀ

No per-element dynamic indexing (Mosaic forbids it), no atomics, no
unaligned slices (windows align to 1024-element boundaries; over-read
neighbors belong to other blocks by sortedness, so their one-hot columns
are zero; padding uses idx = table_size which no block matches).  Per-block
ranges come from a host-side `searchsorted` through scalar prefetch;
ragged ranges use a dynamic `fori_loop` bound (grid steps are sequential
on the core, so skew costs nothing).  The kernel emits [F, T]; the host
transposes.

`hash_scatter_add` is the public entry: sorts, packs, and calls the kernel
on TPU; falls back to `.at[].add` elsewhere (identical semantics — the CPU
test suite's correctness oracle).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_WIN_ROWS = 8                       # rows per DMA window
_WIN = _WIN_ROWS * _LANES           # 1024 updates per window


def _scatter_kernel(starts_ref, idx_hbm, upd_hbm, out_ref, acc_ref,
                    idx_scr, upd_scr, sems, *, block: int, feat: int):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    w0 = start // _WIN
    n_wins = jnp.maximum((end + _WIN - 1) // _WIN - w0, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    base = b * block
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (block, _LANES), 0)

    # double-buffered window pipeline: slot k%2 holds window k; window k+1's
    # DMAs are in flight while window k is accumulated
    def dmas(k, slot):
        r = (w0 + k) * _WIN_ROWS
        return (
            pltpu.make_async_copy(idx_hbm.at[pl.ds(r, _WIN_ROWS), :],
                                  idx_scr.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(upd_hbm.at[pl.ds(r, _WIN_ROWS), :],
                                  upd_scr.at[slot], sems.at[1, slot]),
        )

    @pl.when(n_wins > 0)
    def _():
        d0, d1 = dmas(0, 0)
        d0.start()
        d1.start()

    def window(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_wins)
        def _():
            d0, d1 = dmas(k + 1, jax.lax.rem(k + 1, 2))
            d0.start()
            d1.start()

        d0, d1 = dmas(k, slot)
        d0.wait()
        d1.wait()
        local_all = idx_scr[slot] - base                   # [8, 128]
        for row in range(_WIN_ROWS):                       # static unroll
            local = local_all[row:row + 1, :]              # [1, 128]
            onehot = (rows_iota == local).astype(jnp.bfloat16)  # [block, 128]
            u = upd_scr[slot, row]                         # [F, 128] f32
            # f32-accurate accumulation in TWO default-precision passes:
            # the one-hot operand is EXACT in bf16 (0/1), so only u needs
            # a hi+lo bf16 split (vs 6 passes under Precision.HIGHEST —
            # default TPU matmuls truncate f32 operands to bf16 mantissas)
            u_hi = u.astype(jnp.bfloat16)
            u_lo = (u - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            contrib = (
                jax.lax.dot_general(u_hi, onehot, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(u_lo, onehot, dn,
                                      preferred_element_type=jnp.float32)
            )                                              # [F, block]
            acc_ref[...] += contrib
        return 0

    jax.lax.fori_loop(0, n_wins, window, 0)
    out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("table_size", "block"))
def sorted_block_scatter_add(sidx, supd, table_size: int, *, block: int = 1024):
    """Scatter-add pre-sorted updates into a [table_size, F] table.

    Args:
      sidx: [M] int32, SORTED ascending; entries >= table_size are padding.
      supd: [M, F] float32 updates in the same order.

    Returns: [table_size, F] float32.
    """
    M, F = supd.shape
    assert table_size % block == 0
    n_blocks = table_size // block

    # pack into lane-aligned rows; pad with idx = table_size (no block
    # matches it: table_size - b·block >= block for every b)
    Mpad = ((M + _WIN - 1) // _WIN + 1) * _WIN
    pad = Mpad - M
    idx_rows = jnp.concatenate(
        [sidx.astype(jnp.int32), jnp.full((pad,), table_size, jnp.int32)]
    ).reshape(-1, _LANES)                                   # [Mpad/128, 128]
    upd_pad = jnp.concatenate([supd, jnp.zeros((pad, F), supd.dtype)])
    upd_rows = jnp.stack(
        [upd_pad[:, f].reshape(-1, _LANES) for f in range(F)], axis=1
    )                                                       # [Mpad/128, F, 128]

    boundaries = jnp.arange(0, table_size + 1, block, dtype=jnp.int32)
    starts = jnp.searchsorted(sidx, boundaries).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((F, block), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((F, block), jnp.float32),
            pltpu.VMEM((2, _WIN_ROWS, _LANES), jnp.int32),
            pltpu.VMEM((2, _WIN_ROWS, F, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_scatter_kernel, block=block, feat=F)
    out_ft = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, table_size), jnp.float32),
    )(starts, idx_rows, upd_rows)
    return out_ft.T


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def hash_scatter_add(idx, upd, table_size: int, *, use_pallas: Optional[bool] = None):
    """Unsorted scatter-add: grad_table = zeros.at[idx].add(upd).

    On TPU, sorts (multi-operand lax.sort keeps the payload attached) and
    runs a Pallas sorted-block kernel — the radix-decomposed v2
    (ops/pallas/scatter_v2.py, ~3× cheaper kernel) when the table size
    allows its 4096-entry blocks, else the flat-one-hot v1.  Elsewhere
    (or when use_pallas is False) uses the jnp scatter — identical
    numerics up to f32 summation order.
    """
    idx = idx.astype(jnp.int32)
    upd = upd.astype(jnp.float32)
    if use_pallas is None:
        use_pallas = _on_tpu() and table_size % 1024 == 0
    if not use_pallas:
        F = upd.shape[-1]
        return jnp.zeros((table_size, F), jnp.float32).at[idx].add(
            upd, mode="drop"
        )
    operands = [idx] + [upd[:, f] for f in range(upd.shape[-1])]
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    sidx = sorted_ops[0]
    supd = jnp.stack(sorted_ops[1:], axis=-1)
    return _sorted_scatter(sidx, supd, table_size)


def _sorted_scatter(sidx, supd, table_size: int):
    if table_size % 4096 == 0:
        from .scatter_v2 import sorted_block_scatter_add_v2

        return sorted_block_scatter_add_v2(sidx, supd, table_size)
    return sorted_block_scatter_add(sidx, supd, table_size)


def pack_bf16_pair(upd):
    """[..., 2] f32 → [...] uint32: round each feature to bf16 and pack
    the two halves into one word (hi = feature 0)."""
    b = upd.astype(jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return (u[..., 0] << 16) | u[..., 1]


def unpack_bf16_pair(packed):
    """[...] uint32 → [..., 2] f32, inverse of :func:`pack_bf16_pair`."""
    hi = (packed >> 16).astype(jnp.uint16)
    lo = (packed & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    b = jax.lax.bitcast_convert_type(jnp.stack([hi, lo], axis=-1),
                                     jnp.bfloat16)
    return b.astype(jnp.float32)


def hash_scatter_add_per_level(idx, upd, n_levels: int, table_size: int, *,
                               use_pallas: Optional[bool] = None,
                               payload_bf16: bool = False):
    """Scatter-add for per-level-structured updates: idx [M, L, C] into a
    [L·T, F] table where idx[:, l, :] ∈ [l·T, (l+1)·T).

    Exploits the level structure to replace one flat 33.6M-key sort with a
    batched sort of L independent rows (measured ~15% cheaper on v5e —
    scripts/bench_scatter_variants.py): each row is already confined to
    its level's index range, so the per-row sorted outputs concatenate
    into a globally sorted array, feeding the same sorted-block kernel.

    payload_bf16 (opt-in, F must be 2): round the updates to bf16 and
    pack both features into one uint32, so the sort moves 2 operands
    instead of 3 (the sort is bandwidth-bound and dominates the backward).
    The accumulation in the kernel stays f32; only the pre-sum rounding is
    bf16 (~1e-3 relative gradient noise — same order as bf16 training).
    """
    M, L, C = idx.shape
    F = upd.shape[-1]
    total = n_levels * table_size
    if use_pallas is None:
        use_pallas = _on_tpu() and total % 1024 == 0
    if not use_pallas:
        u = upd.astype(jnp.float32)
        if payload_bf16 and F == 2:
            u = unpack_bf16_pair(pack_bf16_pair(u))    # same rounding
        return jnp.zeros((total, F), jnp.float32).at[idx.reshape(-1)].add(
            u.reshape(-1, F), mode="drop"
        )
    idx_l = idx.astype(jnp.int32).transpose(1, 0, 2).reshape(L, M * C)
    upd_l = upd.astype(jnp.float32).transpose(1, 0, 2, 3).reshape(L, M * C, F)
    if payload_bf16 and F == 2:
        packed = pack_bf16_pair(upd_l)                          # [L, MC] u32
        sidx_l, spacked = jax.lax.sort([idx_l, packed], num_keys=1,
                                       dimension=1)
        sidx = sidx_l.reshape(-1)
        supd = unpack_bf16_pair(spacked.reshape(-1))
    else:
        operands = [idx_l] + [upd_l[..., f] for f in range(F)]
        sorted_ops = jax.lax.sort(operands, num_keys=1, dimension=1)
        sidx = sorted_ops[0].reshape(-1)
        supd = jnp.stack(sorted_ops[1:], axis=-1).reshape(-1, F)
    return _sorted_scatter(sidx, supd, total)
