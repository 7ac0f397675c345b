"""Morton/packbits golden tests vs a pure-python oracle."""

import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.ops.morton import (
    morton3d,
    morton3d_invert,
    packbits,
    unpackbits,
)


def _py_expand(v):
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v & 0xFFFFFFFF


def _py_morton(x, y, z):
    return _py_expand(x) | (_py_expand(y) << 1) | (_py_expand(z) << 2)


def test_morton_golden_values():
    coords = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
                        [127, 127, 127], [5, 9, 31]], jnp.int32)
    out = np.asarray(morton3d(coords))
    expect = [_py_morton(int(c[0]), int(c[1]), int(c[2])) for c in np.asarray(coords)]
    assert out.tolist() == expect
    assert out[:5].tolist() == [0, 1, 2, 4, 7]


def test_morton_roundtrip(rng):
    coords = rng.integers(0, 128, (256, 3)).astype(np.int32)
    idx = morton3d(jnp.asarray(coords))
    back = morton3d_invert(idx)
    assert np.array_equal(np.asarray(back), coords)
    assert int(jnp.max(idx)) < 128 ** 3


def test_packbits_golden():
    grid = jnp.array([0.5, 0.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.9], jnp.float32)
    bf = packbits(grid, thresh=0.1)
    # bits set at positions 0, 2, 7 → 1 + 4 + 128
    assert int(bf[0]) == 1 + 4 + 128


def test_packbits_roundtrip(rng):
    grid = rng.uniform(0, 1, (2, 64)).astype(np.float32)
    bf = packbits(jnp.asarray(grid), thresh=0.5)
    bits = unpackbits(bf)
    assert np.array_equal(np.asarray(bits), grid > 0.5)
