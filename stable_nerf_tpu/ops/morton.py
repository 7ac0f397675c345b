"""Morton (Z-order) indexing and occupancy bitfield packing.

The reference uses Morton order to address its 128³ density grid and a packed
uint8 bitfield for the march kernels (raymarching.cu:57-82,215-301).  On TPU we
keep the occupancy grid as a plain boolean array in linear (x*H² + y*H + z)
order — bit-packing buys nothing for HBM gathers and Morton locality does not
map to XLA tiling.  These utilities exist for (a) checkpoint/bit parity with
the CUDA grid layout and (b) tests.  All are pure int32 bit ops that XLA
vectorizes fine.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    # reference raymarching.cu:57-64 (__expand_bits), 10-bit → every 3rd bit
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords [..., 3] int32 in [0, 1024) → Morton indices [...] int32.

    Matches reference raymarching.cu:66-72 (__morton3D): x | y<<1 | z<<2.
    """
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(x):
    # reference raymarching.cu:74-82 (__morton3D_invert)
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices):
    """Morton indices [...] int32 → coords [..., 3] int32."""
    ind = indices.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(ind >> s).astype(jnp.int32) for s in (0, 1, 2)], axis=-1
    )


def packbits(grid, thresh):
    """Pack a float density grid into a uint8 bitfield, bit i = grid[8k+i] > t.

    Matches reference raymarching.cu:268-301 (kernel_packbits).  ``grid`` is
    [..., N] with N % 8 == 0 (the reference flattens [CAS, H³]); output is
    [..., N // 8] uint8.
    """
    shape = grid.shape
    bits = (grid.reshape(shape[:-1] + (shape[-1] // 8, 8)) > thresh).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield):
    """Inverse of :func:`packbits`: [..., M] uint8 → [..., M*8] bool."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(bitfield.shape[:-1] + (bitfield.shape[-1] * 8,)).astype(bool)
