#!/usr/bin/env python
"""Deterministic synthetic scene generator for the PSNR parity harness.

Zero-egress stand-in for tiny_nerf_data.npz (reference test_nerf.py:146-200
fits the lego scene; the download is blocked here): an analytically
ray-traced three-sphere scene written in the exact tiny_nerf_data.npz layout
(images [N, H, W, 3] float32 in [0, 1], poses [N, 4, 4] Blender convention,
focal), so `StableNeRFDataset("nerf")` / scripts/fit_nerf.py consume it
unchanged.

The scene is its own oracle: every pixel is computed by exact ray-sphere
intersection along the SAME rays the training pipeline generates
(nerf_matrix_to_ngp → get_rays with the dataset's hardcoded
[138, 138, W/2, H/2] intrinsic, reference dataset.py:48), so a perfect NeRF
fit would reach infinite PSNR — measured PSNR is pure model/renderer error.

Usage: python scripts/make_synthetic_scene.py [--out datasets/nerf/synthetic_spheres.npz]
       [--n-views 64] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# spheres in ngp space (inside the [-1, 1]^3 AABB after the 0.33 pose scale):
# (center xyz, radius, base rgb)
SPHERES = [
    (np.array([0.00, 0.00, 0.00]), 0.16, np.array([0.85, 0.25, 0.20])),
    (np.array([0.18, 0.10, 0.12]), 0.09, np.array([0.20, 0.65, 0.90])),
    (np.array([-0.16, -0.06, 0.14]), 0.075, np.array([0.95, 0.85, 0.25])),
]
LIGHT = np.array([0.40824829, 0.81649658, 0.40824829])   # normalized (1,2,1)


def blender_orbit_poses(n: int, radius: float = 4.0) -> np.ndarray:
    """Deterministic orbit of Blender-convention c2w poses (camera looks
    along −z; z column = backward) at two elevations."""
    poses = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        theta = 2.0 * np.pi * i / n
        phi = 0.35 + 0.25 * np.sin(4.0 * np.pi * i / n)     # elevation wobble
        c = radius * np.array([
            np.cos(phi) * np.sin(theta),
            np.sin(phi),
            np.cos(phi) * np.cos(theta),
        ], np.float32)
        back = c / np.linalg.norm(c)                         # z: away from origin
        up = np.array([0.0, 1.0, 0.0], np.float32)
        x = np.cross(up, back); x /= np.linalg.norm(x)
        y = np.cross(back, x)
        poses[i] = np.eye(4, dtype=np.float32)
        poses[i, :3, 0] = x
        poses[i, :3, 1] = y
        poses[i, :3, 2] = back
        poses[i, :3, 3] = c
    return poses


def trace(rays_o: np.ndarray, rays_d: np.ndarray) -> np.ndarray:
    """Exact nearest-hit Lambertian shading over SPHERES on a WHITE
    background.  tiny_nerf_data.npz (lego) — which this scene stands in
    for — has a white background while the parity config renders with
    bg_color 0 (reference test_nerf.py:165); that combination is what
    makes the fit well-posed with the reference's ReLU density
    (network.py:46): the dominant background signal *grows* density.  A
    black background inverts the signal and collapses ReLU density to a
    dead field (measured: loss freezes at mean(gt) within 10 steps)."""
    n = rays_o.shape[0]
    color = np.ones((n, 3), np.float32)
    best_t = np.full((n,), np.inf, np.float32)
    for center, radius, base in SPHERES:
        oc = rays_o - center
        b = np.sum(oc * rays_d, axis=-1)
        cterm = np.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - cterm
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= (t > 1e-4) & (t < best_t)
        p = rays_o + t[:, None] * rays_d
        normal = (p - center) / radius
        lam = np.clip(np.sum(normal * LIGHT, axis=-1), 0.0, 1.0)
        shade = (0.35 + 0.65 * lam)[:, None] * base[None, :]
        color = np.where(hit[:, None], shade.astype(np.float32), color)
        best_t = np.where(hit, t, best_t)
    return color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/nerf/synthetic_spheres.npz")
    ap.add_argument("--n-views", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    # ray generation must match the training pipeline exactly — use it
    from stable_nerf_tpu.data.rays import get_rays, nerf_matrix_to_ngp

    H = W = args.size
    intrinsic = (138.0, 138.0, W / 2, H / 2)   # dataset.py:48 hardcode
    poses = blender_orbit_poses(args.n_views)
    ngp = np.stack([np.asarray(nerf_matrix_to_ngp(p[:3])) for p in poses])

    import jax.numpy as jnp

    rays = get_rays(jnp.asarray(ngp), intrinsic, H, W)
    rays_o = np.asarray(rays["rays_o"], np.float64)   # [N, HW, 3]
    rays_d = np.asarray(rays["rays_d"], np.float64)

    images = np.stack([
        trace(rays_o[i], rays_d[i]).reshape(H, W, 3)
        for i in range(args.n_views)
    ]).astype(np.float32)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, images=images, poses=poses, focal=np.float32(138.0),
             scene="synthetic_spheres")  # marker: NOT tiny-NeRF data (loader guard)
    occ = float((images.sum(-1) < 2.999).mean())
    print(f"wrote {args.out}: {args.n_views} views at {H}x{W}, "
          f"{occ:.1%} foreground coverage")


if __name__ == "__main__":
    main()
