"""Sorted-window gather: Pallas TPU gather for hash-table lookups.

XLA's flat gather costs ~7 ns/row on v5e (measured: 233 ms for the
reference workload's 33.5M 8-byte rows — ARCHITECTURE.md) because it is
memory-latency-bound: each row is an independent random HBM access.  This
kernel exploits that the caller can present indices SORTED ascending:
then each window of 1024 consecutive items touches a *contiguous span* of
the table, which can be streamed HBM→VMEM at full bandwidth and the rows
extracted with the same radix one-hot MXU contraction as the v2 scatter
(ops/pallas/scatter_v2.py):

    local = idx - chunk_base = hi * 128 + lo
    V[f, l, i]  = sum_h Tc[f, h, l] * OH_hi[h, i]     # MXU
    out[f, i]   = sum_l V[f, l, i] * OH_lo[l, i]      # VPU masked reduce

Grid is over item windows (not table blocks), so every window owns its
output rows exclusively — no cross-step write hazards.  Windows whose
span exceeds one 4096-entry chunk loop over successive chunks with
double-buffered DMA, accumulating extractions (each item matches in
exactly one chunk).  Hot table entries are touched by consecutive items,
so an entry is re-DMA'd at most once per window that covers it: total
chunk traffic is ~n_windows × 32 KB ≈ 1 GB ≈ 1.3 ms of HBM bandwidth at
the reference workload.

The table is passed pre-arranged as [F, T/128, 128] (sublane-sliceable at
any 128-entry boundary); `sorted_window_gather` does the rearrangement.
Compute dtype is bf16 (the NeRF forward's compute_dtype); the one-hot
mask product is exact, so error vs f32 gather is just the bf16 rounding
of the table values.

Replaces the forward table lookup of tiny-cuda-nn's hash grid
(reference nerf/network.py:23-26, tcnn grid.h) on the TPU fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_WIN_ROWS = 8                       # item rows per window
_WIN = _WIN_ROWS * _LANES           # 1024 items per window
_SUB = 32                           # chunk sublane rows
_CHUNK = _SUB * _LANES              # 4096 table entries per chunk


def _gather_kernel(r0_ref, nchunk_ref, idx_hbm, tab_hbm, out_ref,
                   idx_scr, tab_scr, isem, tsems, *, feat: int):
    w = pl.program_id(0)
    # chunk-0 base in 128-entry rows; host side rounds it to _SUB, the
    # hint lets Mosaic prove the DMA slice start is tile-aligned
    r0 = pl.multiple_of(r0_ref[w], _SUB)
    n_chunks = nchunk_ref[w]

    # this window's indices (one small DMA; idx rows are window-aligned)
    pltpu.make_async_copy(idx_hbm.at[pl.ds(w * _WIN_ROWS, _WIN_ROWS), :],
                          idx_scr, isem).start()

    def tab_dma(c, slot):
        return pltpu.make_async_copy(
            tab_hbm.at[:, pl.ds((r0 + c * _SUB), _SUB), :],
            tab_scr.at[slot], tsems.at[slot],
        )

    tab_dma(0, 0).start()
    pltpu.make_async_copy(idx_hbm.at[pl.ds(w * _WIN_ROWS, _WIN_ROWS), :],
                          idx_scr, isem).wait()
    idx = idx_scr[...]                                      # [8, 128]

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    base0 = r0 * _LANES

    def chunk_step(c, accs):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            tab_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

        tab_dma(c, slot).wait()
        tc = tab_scr[slot]                                  # [F, 32, 128] bf16
        local_all = idx - (base0 + c * _CHUNK)              # [8, 128]
        # per-row accumulators carried as a TUPLE: an .at[].add on a
        # stacked value lowers to the scatter-add primitive, which Pallas
        # TPU cannot lower inside fori_loop
        new = []
        for row in range(_WIN_ROWS):                        # static unroll
            local = local_all[row:row + 1, :]               # [1, 128]
            hi = jax.lax.shift_right_arithmetic(local, 7)
            lo = jax.lax.bitwise_and(local, 127)
            oh_hi = (hi_iota == hi).astype(jnp.bfloat16)    # [32, 128]
            oh_lo = (lo_iota == lo).astype(jnp.bfloat16)    # [128, 128]
            # V[f, l, i] = sum_h tc[f, h, l] * oh_hi[h, i]
            v = jax.lax.dot_general(
                tc, oh_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [F, 128, 128]
            feat_i = jnp.sum(v * oh_lo[None].astype(jnp.float32), axis=1)
            new.append(accs[row] + feat_i)
        return tuple(new)

    acc0 = tuple(jnp.zeros((feat, _LANES), jnp.float32)
                 for _ in range(_WIN_ROWS))
    accs = jax.lax.fori_loop(0, n_chunks, chunk_step, acc0)
    out_ref[...] = jnp.stack(accs, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sorted_window_gather(table, sidx, interpret: bool = False):
    """Gather table rows at SORTED indices.

    Args:
      table: [T, F] float (any dtype; computed in bf16), T % 128 == 0.
      sidx: [M] int32, sorted ascending, in [0, T) (entries >= T are
        clamped to T-1 and gather real rows — callers mask padding).

    Returns: [M, F] float32 rows ``table[sidx]`` (bf16-rounded values).
    """
    T, F = table.shape
    assert T % _CHUNK == 0, T
    M = sidx.shape[0]

    Mpad = ((M + _WIN - 1) // _WIN) * _WIN
    sidx_c = jnp.clip(sidx.astype(jnp.int32), 0, T - 1)
    idx_rows = jnp.concatenate(
        [sidx_c, jnp.full((Mpad - M,), T - 1, jnp.int32)]
    ).reshape(-1, _LANES)                                   # [Mpad/128, 128]
    n_windows = Mpad // _WIN

    # per-window chunk-0 base row and chunk count (host-side, cheap).
    # r0 rounds DOWN to chunk granularity: Mosaic requires the DMA slice
    # start (r0 + c*_SUB) to sit on a sublane-tile boundary
    win_first = idx_rows[::_WIN_ROWS, 0]                    # [n_windows]
    win_last = idx_rows[_WIN_ROWS - 1::_WIN_ROWS, -1]
    r0 = jnp.minimum(win_first // _LANES // _SUB * _SUB,
                     T // _LANES - _SUB)
    n_chunks = (win_last - r0 * _LANES) // _CHUNK + 1
    max_chunks = T // _CHUNK

    # [F, T/128, 128]: sublane-sliceable at any 128-entry boundary
    tab3 = table.astype(jnp.bfloat16).T.reshape(F, T // _LANES, _LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((F, _WIN_ROWS, _LANES),
                               lambda i, *_: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_WIN_ROWS, _LANES), jnp.int32),
            pltpu.VMEM((2, F, _SUB, _LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, feat=F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_windows * _WIN_ROWS, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(r0.astype(jnp.int32), n_chunks.astype(jnp.int32), idx_rows, tab3)
    return out.reshape(F, Mpad).T[:M]
