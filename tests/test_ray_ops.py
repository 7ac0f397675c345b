"""Unit tests for ray/AABB ops vs hand-computed values and a numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.ops.ray_ops import FLT_MAX, near_far_from_aabb, sph_from_ray


def _oracle_near_far(o, d, aabb, min_near):
    """Direct transcription of the CUDA slab test semantics."""
    with np.errstate(divide="ignore"):
        rd = 1.0 / d
    near = (aabb[0] - o[0]) * rd[0]
    far = (aabb[3] - o[0]) * rd[0]
    if near > far:
        near, far = far, near
    for ax in (1, 2):
        n2 = (aabb[ax] - o[ax]) * rd[ax]
        f2 = (aabb[ax + 3] - o[ax]) * rd[ax]
        if n2 > f2:
            n2, f2 = f2, n2
        if near > f2 or n2 > far:
            return float(FLT_MAX), float(FLT_MAX)
        near, far = max(near, n2), min(far, f2)
    return max(near, min_near), far


def test_near_far_matches_oracle(rng):
    aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    o = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb))
    for k in range(64):
        en, ef = _oracle_near_far(o[k], d[k], aabb, 0.2)
        assert np.isclose(float(nears[k]), en, rtol=1e-5), k
        assert np.isclose(float(fars[k]), ef, rtol=1e-5), k


def test_near_far_axis_aligned_hit():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    n, f = near_far_from_aabb(o, d, aabb, min_near=0.2)
    assert np.isclose(float(n[0]), 4.0)
    assert np.isclose(float(f[0]), 6.0)


def test_near_far_miss_gets_flt_max():
    o = jnp.array([[0.0, 5.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])   # parallel to the box, above it
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    n, f = near_far_from_aabb(o, d, aabb)
    assert float(n[0]) == float(FLT_MAX)
    assert float(f[0]) == float(FLT_MAX)


def test_near_clamped_to_min_near():
    o = jnp.array([[0.0, 0.0, 0.0]])   # inside the box
    d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    n, f = near_far_from_aabb(o, d, aabb, min_near=0.2)
    assert np.isclose(float(n[0]), 0.2)
    assert np.isclose(float(f[0]), 1.0)


def test_sph_from_ray_axis_directions():
    o = jnp.zeros((3, 3))
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    coords = sph_from_ray(o, d, radius=2.0)
    # +y: theta=0 → 2*0/pi-1 = -1 ; -y: theta=pi → +1 ; +x: theta=pi/2 → 0, phi=0
    assert np.isclose(float(coords[0, 0]), -1.0, atol=1e-6)
    assert np.isclose(float(coords[1, 0]), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(coords[2]), [0.0, 0.0], atol=1e-6)
    # all points lie on the sphere
    t = 2.0  # |o|=0 → t = radius for unit d
    p = np.asarray(o + t * d)
    assert np.allclose(np.linalg.norm(p, axis=-1), 2.0)
