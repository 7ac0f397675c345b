"""Camera → ray generation and pose utilities.

Reproduces reference utils/graphics_utils.py exactly, including its quirks:
pixel centers at +0.5, directions normalized *before* rotation, the ngp axis
swap with 0.33 translation scale, and the orbit pose sampler's y-down up
vector.  Random sampling modes thread explicit `jax.random` keys instead of
global torch RNG (SURVEY.md §7 "RNG discipline").
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_rays(
    poses,
    intrinsics,
    H: int,
    W: int,
    N: int = -1,
    key: Optional[jax.Array] = None,
    error_map=None,
    patch_size: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Generate rays from cam2world poses.

    Mirrors reference utils/graphics_utils.py:6-88.

    Args:
      poses: [B, 4, 4] cam2world.
      intrinsics: (fx, fy, cx, cy).
      H, W: image size.
      N: number of rays to sample; -1 = full image.
      key: PRNG key, required when N > 0.
      error_map: [B, 128·128] sampling weights (error-map mode).
      patch_size: >1 enables patch-based sampling (ignores error_map).

    Returns: dict with 'rays_o', 'rays_d' [B, N, 3] and 'inds' [B, N]
      (+ 'inds_coarse' in error-map mode).
    """
    poses = jnp.asarray(poses, jnp.float32)
    B = poses.shape[0]
    fx, fy, cx, cy = [float(v) for v in intrinsics]

    # pixel grid, +0.5 centers (graphics_utils.py:22-24)
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    i = jnp.broadcast_to(i.reshape(1, H * W), (B, H * W)) + 0.5
    j = jnp.broadcast_to(j.reshape(1, H * W), (B, H * W)) + 0.5

    results: Dict[str, jnp.ndarray] = {}

    if N > 0:
        N = min(N, H * W)
        if key is None:
            raise ValueError("get_rays with N > 0 requires a PRNG key")

        if patch_size > 1:
            # random top-left corners, then a dense patch grid
            # (graphics_utils.py:34-49)
            num_patch = N // (patch_size ** 2)
            kx, ky = jax.random.split(key)
            inds_x = jax.random.randint(kx, (num_patch,), 0, H - patch_size)
            inds_y = jax.random.randint(ky, (num_patch,), 0, W - patch_size)
            corner = jnp.stack([inds_x, inds_y], axis=-1)          # [np, 2]
            pi, pj = jnp.meshgrid(
                jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij"
            )
            offsets = jnp.stack([pi.reshape(-1), pj.reshape(-1)], -1)
            inds2 = (corner[:, None, :] + offsets[None, :, :]).reshape(-1, 2)
            inds = inds2[:, 0] * W + inds2[:, 1]
            N = inds.shape[0]
            inds = jnp.broadcast_to(inds[None], (B, N))
        elif error_map is None:
            inds = jax.random.randint(key, (N,), 0, H * W)          # may dup
            inds = jnp.broadcast_to(inds[None], (B, N))
        else:
            # weighted sample on the 128×128 error grid, then perturb to
            # full res (graphics_utils.py:56-66)
            error_map = jnp.asarray(error_map, jnp.float32)
            kc, kx, ky = jax.random.split(key, 3)
            logits = jnp.log(jnp.maximum(error_map, 1e-12))

            # weighted sampling WITHOUT replacement (the reference's
            # torch.multinomial(..., replacement=False),
            # graphics_utils.py:61) via the Gumbel-top-k trick — exact,
            # jit-friendly, no sequential rejection loop.
            def _sample_wor(k, lg):
                g = jax.random.gumbel(k, lg.shape)
                return jax.lax.top_k(lg + g, N)[1]

            inds_coarse = jax.vmap(_sample_wor)(
                jax.random.split(kc, B), logits
            )
            ix, iy = inds_coarse // 128, inds_coarse % 128
            sx, sy = H / 128.0, W / 128.0
            ix = jnp.clip(
                (ix * sx + jax.random.uniform(kx, (B, N)) * sx).astype(jnp.int32),
                max=H - 1,
            )
            iy = jnp.clip(
                (iy * sy + jax.random.uniform(ky, (B, N)) * sy).astype(jnp.int32),
                max=W - 1,
            )
            inds = ix * W + iy
            results["inds_coarse"] = inds_coarse

        i = jnp.take_along_axis(i, inds, axis=-1)
        j = jnp.take_along_axis(j, inds, axis=-1)
    else:
        inds = jnp.broadcast_to(jnp.arange(H * W)[None], (B, H * W))

    results["inds"] = inds

    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    # rotate: dirs @ R^T (graphics_utils.py:80)
    rays_d = jnp.einsum("bnk,bjk->bnj", directions, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)

    results["rays_o"] = rays_o
    results["rays_d"] = rays_d
    return results


def rand_poses(
    key,
    size: int,
    radius: float = 1.0,
    theta_range: Tuple[float, float] = (np.pi / 3, 2 * np.pi / 3),
    phi_range: Tuple[float, float] = (0.0, 2 * np.pi),
) -> jnp.ndarray:
    """Random orbit-camera poses (reference graphics_utils.py:91-125).

    Returns [size, 4, 4] cam2world with the reference's y-down up vector.
    """
    kt, kp = jax.random.split(key)
    thetas = jax.random.uniform(
        kt, (size,), minval=theta_range[0], maxval=theta_range[1]
    )
    phis = jax.random.uniform(kp, (size,), minval=phi_range[0], maxval=phi_range[1])

    centers = jnp.stack(
        [
            radius * jnp.sin(thetas) * jnp.sin(phis),
            radius * jnp.cos(thetas),
            radius * jnp.sin(thetas) * jnp.cos(phis),
        ],
        axis=-1,
    )

    def normalize(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), forward.shape)
    right = normalize(jnp.cross(forward, up))
    up = normalize(jnp.cross(right, forward))

    rot = jnp.stack([right, up, forward], axis=-1)                 # [B, 3, 3]
    poses = jnp.tile(jnp.eye(4)[None], (size, 1, 1))
    poses = poses.at[:, :3, :3].set(rot)
    poses = poses.at[:, :3, 3].set(centers)
    return poses


def nerf_matrix_to_ngp(pose, scale: float = 0.33, offset=(0, 0, 0)) -> np.ndarray:
    """NeRF→ngp pose convention: axis cycle + flip, translation × scale.

    Matches reference graphics_utils.py:129-137 element-for-element.
    """
    pose = np.asarray(pose)
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
