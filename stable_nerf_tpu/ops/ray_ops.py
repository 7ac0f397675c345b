"""Ray/AABB geometry ops.

TPU-native equivalents of the per-ray CUDA utility kernels in the reference
(`submodules/raymarching/src/raymarching.cu:92-210`).  These are trivially
data-parallel, so on TPU they are plain vectorized jnp that XLA fuses into the
surrounding computation — no custom kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp

FLT_MAX = jnp.float32(3.4028235e38)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Slab-test ray/AABB intersection.

    Semantics match reference raymarching.cu:92-157 (kernel_near_far_from_aabb):
    missed rays get near == far == FLT_MAX; near is clamped to ``min_near``.

    Args:
      rays_o: [..., 3] ray origins.
      rays_d: [..., 3] ray directions (not necessarily unit norm).
      aabb:   [6] (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: minimum near distance.

    Returns:
      (nears, fars): each [...], float32.
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    rdir = 1.0 / rays_d  # inf where d == 0, matching the CUDA divide
    lo = (aabb[:3] - rays_o) * rdir
    hi = (aabb[3:] - rays_o) * rdir
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, FLT_MAX, near)
    far = jnp.where(miss, FLT_MAX, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Ray ↔ sphere intersection → (theta, phi) in [-1, 1].

    Background-sphere coordinates; semantics of reference raymarching.cu:163-210
    (kernel_sph_from_ray).  Assumes origins inside Sphere(radius); y is up.

    Returns: [..., 2] coords, (2*theta/pi - 1, phi/pi).
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)          # B/2 in the quadratic
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-b + jnp.sqrt(b * b - a * c)) / a          # larger (positive) root
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)                          # [-pi, pi)
    inv_pi = 1.0 / jnp.pi
    return jnp.stack([2 * theta * inv_pi - 1, phi * inv_pi], axis=-1)
