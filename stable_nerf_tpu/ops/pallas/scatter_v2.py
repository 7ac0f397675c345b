"""Radix-decomposed sorted-block scatter-add (experimental v2 kernel).

The v1 kernel (ops/pallas/scatter.py) is VPU-bound: building the
``[block, 128]`` one-hot costs ``block`` int compares per update, so at
block=1024 each 128-update row burns ~131k VPU ops while the MXU sits
idle.  This kernel factors the one-hot through a radix decomposition of
the local index::

    local = hi * 128 + lo,   hi in [0, 32),  lo in [0, 128)
    onehot[t, i] = OH_hi[hi(t), i] * OH_lo[lo(t), i]

so per 128-update row we build only a [32, 128] and a [128, 128] one-hot
(20k compares, 6.5x fewer than an equivalent 4096-wide flat one-hot) and
contract on the MXU:

    A[f, h, i]   = u[f, i] * OH_hi[h, i]        # exact: OH is 0/1
    acc[f, h, l] += A[(f h), i] . OH_lo[l, i]^T  # dot_general over i

Multiplying by a 0/1 mask is exact in bf16, so the hi/lo-split trick from
v1 carries over unchanged: split only ``u`` into bf16 hi+lo parts and run
two default-precision MXU passes (~1e-5 relative error, same as v1).

Block size is 4096 (=32*128), 4x larger than v1, which also cuts the
per-block fixed costs (accumulator zeroing, grid steps) 4x.  The
accumulator lives as [F, 32, 128] and the kernel output is 4-D
[F, n_blocks, 32, 128] so no Mosaic lane-crossing reshape is needed; the
host reshapes (contiguously) to [F, T] and transposes.

Padding/overlap correctness: padded items carry idx = table_size, so
``local >= block`` for every block and hi falls outside [0, 32); items
bleeding in from neighboring blocks via window over-read have local < 0
or >= block and likewise match no hi row (arithmetic shift keeps
negatives negative).

Same role as the reference's atomicAdd grid backward
(submodules/raymarching CUDA patterns; tcnn grid.h backward) — see
ops/pallas/scatter.py for the full mapping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_WIN_ROWS = 8                       # rows per DMA window
_WIN = _WIN_ROWS * _LANES           # 1024 updates per window
_SUB = 32                           # hi radix width
_BLOCK = _SUB * _LANES              # 4096 table entries per grid step


def _scatter_kernel_v2(starts_ref, idx_hbm, upd_hbm, out_ref, acc_ref,
                       idx_scr, upd_scr, sems, *, feat: int):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    w0 = start // _WIN
    n_wins = jnp.maximum((end + _WIN - 1) // _WIN - w0, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    base = b * _BLOCK
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)

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

    dn = (((2,), (1,)), ((), ()))    # contract the item dim of A and OH_lo

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
            hi = jax.lax.shift_right_arithmetic(local, 7)
            lo = jax.lax.bitwise_and(local, 127)
            oh_hi = (hi_iota == hi).astype(jnp.bfloat16)   # [32, 128]
            oh_lo = (lo_iota == lo).astype(jnp.bfloat16)   # [128, 128]
            u = upd_scr[slot, row]                         # [F, 128] f32
            u_hi = u.astype(jnp.bfloat16)
            u_lo = (u - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            # A[f, h, i] = u[f, i] * oh_hi[h, i]: exact (0/1 mask)
            a_hi = u_hi[:, None, :] * oh_hi[None]          # [F, 32, 128]
            a_lo = u_lo[:, None, :] * oh_hi[None]
            contrib = (
                jax.lax.dot_general(a_hi, oh_lo, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_lo, oh_lo, dn,
                                      preferred_element_type=jnp.float32)
            )                                              # [F, 32, 128]
            acc_ref[...] += contrib
        return 0

    jax.lax.fori_loop(0, n_wins, window, 0)
    out_ref[...] = acc_ref[...][:, None]


@functools.partial(jax.jit, static_argnames=("table_size", "interpret"))
def sorted_block_scatter_add_v2(sidx, supd, table_size: int,
                                interpret: bool = False):
    """Scatter-add pre-sorted updates into a [table_size, F] table.

    Args:
      sidx: [M] int32, SORTED ascending; entries >= table_size are padding.
      supd: [M, F] float32 updates in the same order.

    Returns: [table_size, F] float32.
    """
    M, F = supd.shape
    assert table_size % _BLOCK == 0, table_size
    n_blocks = table_size // _BLOCK

    Mpad = ((M + _WIN - 1) // _WIN + 1) * _WIN
    pad = Mpad - M
    idx_rows = jnp.concatenate(
        [sidx.astype(jnp.int32), jnp.full((pad,), table_size, jnp.int32)]
    ).reshape(-1, _LANES)                                   # [Mpad/128, 128]
    upd_pad = jnp.concatenate([supd, jnp.zeros((pad, F), supd.dtype)])
    upd_rows = jnp.stack(
        [upd_pad[:, f].reshape(-1, _LANES) for f in range(F)], axis=1
    )                                                       # [Mpad/128, F, 128]

    boundaries = jnp.arange(0, table_size + 1, _BLOCK, dtype=jnp.int32)
    starts = jnp.searchsorted(sidx, boundaries).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((F, 1, _SUB, _LANES),
                               lambda i, *_: (0, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((F, _SUB, _LANES), jnp.float32),
            pltpu.VMEM((2, _WIN_ROWS, _LANES), jnp.int32),
            pltpu.VMEM((2, _WIN_ROWS, F, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_scatter_kernel_v2, feat=F)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_blocks, _SUB, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(starts, idx_rows, upd_rows)
    return out.reshape(F, table_size).T
