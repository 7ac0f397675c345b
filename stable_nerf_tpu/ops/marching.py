"""Fixed-shape occupancy-grid ray marching.

TPU-native replacement for the reference's CUDA compaction march
(raymarching.cu:312-491 kernel_march_rays_train, :733-848 kernel_march_rays).

Design note (the load-bearing observation): with ``dt_gamma == 0`` — the only
setting the reference ever runs (renderer.py:70 default, never overridden) —
the CUDA kernel's step size is constant ``dt_min = 2·sqrt(3)/max_steps`` and its
voxel-skip loop (`do { t += dt } while (t < tt)`, raymarching.cu:396-399) keeps
``t`` on the uniform lattice ``t0 + k·dt``.  Skipped lattice points lie inside
unoccupied voxels by construction, so the march is *exactly* equivalent to:
evaluate every lattice point, mask those whose voxel is unoccupied.  That
masked-lattice formulation needs no atomics, no compaction and no dynamic
shapes — it is the idiomatic TPU design, and it is bit-equivalent in the
sample positions the reference produces (up to float associativity).

The ``mean_count`` ray-dropping machinery (raymarching.py:198-203) exists only
to bound the compacted buffer; masking makes it moot and it is intentionally
not reproduced (documented divergence, SURVEY.md §7 delta 1).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


def mip_from_pos(pos, cascade: int):
    """Mip level from position magnitude: frexp exponent of max|coord|.

    Matches reference raymarching.cu:43-48 ([0,0.5)→-1, [0.5,1)→0, [1,2)→1 …,
    clamped to [0, cascade-1]).
    """
    mx = jnp.max(jnp.abs(pos), axis=-1)
    _, exp = jnp.frexp(mx)
    return jnp.clip(exp, 0, cascade - 1).astype(jnp.int32)


def mip_from_dt(dt, grid_size: int, cascade: int):
    """Mip level from step size (reference raymarching.cu:50-55)."""
    _, exp = jnp.frexp(dt * grid_size * 0.5)
    return jnp.clip(exp, 0, cascade - 1).astype(jnp.int32)


def occupancy_lookup(occ_grid, pos, dt, bound: float, cascade: int, grid_size: int):
    """Query the boolean occupancy grid at world positions.

    Args:
      occ_grid: [cascade, H, H, H] bool, linear (x, y, z) layout.
      pos: [..., 3] world positions (already clamped to [-bound, bound]).
      dt: step size, scalar or broadcastable to pos[..., 0].
      bound, cascade, grid_size: grid geometry.

    Returns: [...] bool.

    Mirrors the voxel addressing of raymarching.cu:366-380: level = max(mip from
    pos, mip from dt); voxel = floor(0.5·(x/mip_bound + 1)·H) clamped to H-1.
    """
    H = grid_size
    level = jnp.maximum(
        mip_from_pos(pos, cascade), mip_from_dt(jnp.asarray(dt), H, cascade)
    )
    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
    scaled = 0.5 * (pos / mip_bound[..., None] + 1.0) * H
    n = jnp.clip(scaled.astype(jnp.int32), 0, H - 1)
    # one flat 1-D gather into [cascade·H³] — keeps XLA from materializing
    # per-sample grid rows
    flat = occ_grid.reshape(-1)
    idx = ((level * H + n[..., 0]) * H + n[..., 1]) * H + n[..., 2]
    return flat[idx]


def march_rays_lattice(
    rays_o,
    rays_d,
    nears,
    fars,
    occ_grid,
    *,
    bound: float,
    cascade: int,
    grid_size: int,
    max_steps: int,
    n_samples: int | None = None,
    noise=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate the masked sample lattice for a batch of rays.

    Args:
      rays_o, rays_d: [N, 3].
      nears, fars: [N] from :func:`near_far_from_aabb`.
      occ_grid: [cascade, H, H, H] bool occupancy.
      max_steps: the reference's ``max_steps`` — sets dt = 2·sqrt(3)/max_steps
        and caps the number of *occupied* samples per ray.
      n_samples: lattice length K (static).  Defaults to ``max_steps``, which
        covers the full AABB diagonal at bound=1.  For bound > 1 pass a larger
        K to keep parity with the CUDA march on long rays.
      noise: optional [N] in [0, 1) perturbation of t0 (reference
        raymarching.py:213-216 / raymarching.cu:352: t0 += dt·noise).

    Returns:
      xyzs:  [N, K, 3] sample positions, clamped to [-bound, bound].
      ts:    [N, K] sample distances along the ray.
      dt:    scalar step size (float32).
      valid: [N, K] bool — in-range, occupied, and under the max_steps cap.
      t0:    [N] march start distance (near + perturbation).
    """
    K = n_samples if n_samples is not None else max_steps
    dt = jnp.float32(2.0 * SQRT3 / max_steps)

    t0 = nears
    if noise is not None:
        t0 = t0 + dt * noise
    ks = jnp.arange(K, dtype=jnp.float32)
    ts = t0[:, None] + ks[None, :] * dt                       # [N, K]
    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -bound, bound)

    in_range = ts < fars[:, None]
    occ = occupancy_lookup(occ_grid, pos, dt, bound, cascade, grid_size)
    valid = in_range & occ
    # num_steps cap (reference raymarching.cu:360 `num_steps < max_steps`)
    if K > max_steps:
        valid = valid & (jnp.cumsum(valid.astype(jnp.int32), axis=-1) <= max_steps)
    return pos, ts, dt, valid, t0


def march_rays_iterative(
    rays_o,
    rays_d,
    nears,
    fars,
    occ_grid,
    *,
    bound: float,
    cascade: int,
    grid_size: int,
    max_steps: int,
    dt_gamma: float = 0.0,
    n_samples: int | None = None,
    noise=None,
    iter_max: int | None = None,
):
    """Exact transcription of the CUDA DDA march as a fixed-shape scan.

    Implements kernel_march_rays_train (raymarching.cu:312-491) step for
    step, including cone-angle stepping (``dt_gamma > 0``, raymarching.cu:366)
    and analytic voxel skipping — the slow-but-exact oracle used to validate
    :func:`march_rays_lattice` (which is equivalent when dt_gamma == 0) and
    the only path supporting dt_gamma > 0.

    Returns:
      xyzs [N, K, 3], ts [N, K] (sample distances), dts [N, K] (per-sample
      step sizes, the CUDA deltas[:, 0]), delta_depth [N, K] (deltas[:, 1]),
      valid [N, K], t0 [N].
    """
    K = n_samples if n_samples is not None else max_steps
    H = grid_size
    dt_min = jnp.float32(2.0 * SQRT3 / max_steps)
    dt_max = jnp.float32(2.0 * SQRT3 * (2 ** (cascade - 1)) / H)
    occ_flat = occ_grid.reshape(-1)
    # safety bound on total iterations: every iteration either writes a
    # sample (≤ max_steps) or crosses ≥ 1 voxel boundary (≤ ~3H per cascade)
    ITER = iter_max if iter_max is not None else max_steps + 4 * H * cascade

    def one_ray(o, d, near, far, nz):
        t0 = near + jnp.clip(near * dt_gamma, dt_min, dt_max) * nz
        rd = 1.0 / d

        def probe(t):
            pos = jnp.clip(o + t * d, -bound, bound)
            dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
            level = jnp.maximum(
                mip_from_pos(pos, cascade), mip_from_dt(dt, H, cascade)
            )
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
            n = jnp.clip((0.5 * (pos / mip_bound + 1.0) * H).astype(jnp.int32),
                         0, H - 1)
            flat = ((level * H + n[0]) * H + n[1]) * H + n[2]
            occ = occ_flat[flat]
            return pos, dt, n, mip_bound, occ

        def skip(t, n, mip_bound):
            # distance to next voxel boundary (raymarching.cu:390-399)
            nf = n.astype(jnp.float32)
            bounds = ((nf + 0.5 + 0.5 * jnp.sign(d)) / H * 2.0 - 1.0) * mip_bound
            pos = jnp.clip(o + t * d, -bound, bound)
            tv = (bounds - pos) * rd
            tt = t + jnp.maximum(0.0, jnp.min(tv))

            def cond(tc):
                return tc < tt

            def body(tc):
                return tc + jnp.clip(tc * dt_gamma, dt_min, dt_max)

            # do-while: advance at least once
            t = body(t)
            return jax.lax.while_loop(cond, body, t)

        def iter_body(it, state):
            t, last_t, step, xyzs, ts, dts, dd, valid = state
            active = (t < far) & (step < max_steps)
            pos, dt, n, mip_bound, occ = probe(t)

            def write(_):
                t_new = t + dt
                s = jnp.minimum(step, K - 1)
                return (
                    t_new, t_new, step + 1,
                    jax.lax.dynamic_update_slice(xyzs, pos[None], (s, 0)),
                    jax.lax.dynamic_update_slice(ts, t[None], (s,)),
                    jax.lax.dynamic_update_slice(dts, dt[None], (s,)),
                    jax.lax.dynamic_update_slice(dd, (t_new - last_t)[None], (s,)),
                    jax.lax.dynamic_update_slice(
                        valid, (step < K)[None], (s,)),
                )

            def advance(_):
                return (skip(t, n, mip_bound), last_t, step,
                        xyzs, ts, dts, dd, valid)

            new_state = jax.lax.cond(occ, write, advance, None)
            return jax.tree.map(
                lambda new, old: jnp.where(active, new, old), new_state, state
            )

        init = (
            t0, t0, jnp.int32(0),
            jnp.zeros((K, 3), jnp.float32), jnp.zeros((K,), jnp.float32),
            jnp.zeros((K,), jnp.float32), jnp.zeros((K,), jnp.float32),
            jnp.zeros((K,), bool),
        )
        state = jax.lax.fori_loop(0, ITER, iter_body, init)
        _, _, _, xyzs, ts, dts, dd, valid = state
        return xyzs, ts, dts, dd, valid, t0

    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    if noise is None:
        noise = jnp.zeros(rays_o.shape[0])
    return jax.vmap(one_ray)(rays_o, rays_d, nears, fars, noise)
