"""Volume renderer: march → NeRF eval → composite → background blend.

Functional equivalent of reference nerf/renderer.py:70-172 (run_cuda).  One
code path serves both training and inference: the reference needs a separate
alive-ray compaction while-loop for eval (renderer.py:119-167) only because
its CUDA march materializes compacted point buffers; the fixed-shape masked
lattice needs neither — eval is the same dense pipeline with ``max_steps=512``
and no perturbation, and the early-exit masking inside
:func:`stable_nerf_tpu.ops.composite.composite_rays` supplies the same
T<T_thresh termination.

Output numerics match the reference:
  * image = composited + (1 − weights_sum)·bg_color        (renderer.py:111)
  * depth = clamp(depth − near, 0) / (far − near)          (renderer.py:112)
    — for missed rays the reference divides 0/0 → NaN; we emit 0 instead
    (guarded divide; deliberate, NaN-free divergence).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...config import NeRFConfig
from ...ops.compaction import compact_plan, gather_compact, scatter_back
from ...ops.composite import composite_rays
from ...ops.marching import march_rays_lattice
from ...ops.ray_ops import near_far_from_aabb
from .grid import OccupancyGridState
from .network import NeRFParams, nerf_apply


def _eval_samples(params, pos, dirs, cfg, compute_dtype, eval_chunk,
                  stochastic=False):
    """NeRF-evaluate flat [M, 3] samples, chunked to bound HBM peaks."""
    M = pos.shape[0]
    if M > eval_chunk and M % eval_chunk == 0:
        n_chunks = M // eval_chunk
        sig, rgb = jax.lax.map(
            lambda xd: nerf_apply(params, xd[0], xd[1], cfg, compute_dtype,
                                  stochastic=stochastic),
            (pos.reshape(n_chunks, eval_chunk, 3),
             dirs.reshape(n_chunks, eval_chunk, 3)),
        )
        return sig.reshape(M), rgb.reshape(M, cfg.channel_dim)
    return nerf_apply(params, pos, dirs, cfg, compute_dtype,
                      stochastic=stochastic)


def render(
    params: NeRFParams,
    grid_state: OccupancyGridState,
    rays_o,
    rays_d,
    cfg: NeRFConfig,
    *,
    bg_color=1.0,
    max_steps: int = 256,
    t_thresh: float = 1e-4,
    perturb_key: Optional[jax.Array] = None,
    n_samples: Optional[int] = None,
    compute_dtype=jnp.float32,
    eval_chunk: int = 2 ** 17,
    sample_budget: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Render rays through the occupancy-grid NeRF.

    Args:
      rays_o, rays_d: [..., 3] (any leading batch shape, like the
        reference's prefix handling at renderer.py:74-77).
      bg_color: scalar or [channel_dim] background blended by (1 − ws).
      max_steps: lattice resolution/step cap (256 train / 512 eval,
        reference train.py:27,340).
      perturb_key: optional PRNG key → per-ray t0 jitter (training only).
      n_samples: lattice length override (defaults to max_steps).
      eval_chunk: samples per NeRF-eval chunk — bounds the hash-gather
        index intermediates ([chunk, L, 8, 3]) so HBM peak stays flat
        regardless of ray count (lax.map serializes chunks).
      sample_budget: if set, NeRF-evaluate at most this many valid samples
        (static compaction, step-major order; over-budget samples dropped —
        the reference's mean_count semantics).  None = dense evaluation of
        the full lattice.  TRAINING CAVEAT: a budget that binds while the
        scene is still fog (dense occupancy) truncates rays mid-flight and
        blends the background through the cut — a gradient regime the
        reference never enters (its mean_count pool adapts UP in the fog
        phase, raymarching.py:198-203) and one that measurably collapses
        from-scratch fits.  Use a budget only once occupancy is sparse, or
        make it ≥ the fog-phase valid count.

    Returns: {'image': [..., C], 'depth': [...], 'weights_sum': [...]}.
    """
    # one-corner hash sampling only while training (perturb jitters x each
    # step, refreshing the stateless draw); eval stays exact trilinear
    stochastic = cfg.hash_stochastic and perturb_key is not None

    prefix = rays_o.shape[:-1]
    o = rays_o.reshape(-1, 3).astype(jnp.float32)
    d = rays_d.reshape(-1, 3).astype(jnp.float32)
    N = o.shape[0]

    aabb = jnp.asarray(
        [-cfg.bound, -cfg.bound, -cfg.bound, cfg.bound, cfg.bound, cfg.bound],
        jnp.float32,
    )
    nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)

    noise = None
    if perturb_key is not None:
        noise = jax.random.uniform(perturb_key, (N,))

    pos, ts, dt, valid, t0 = march_rays_lattice(
        o, d, nears, fars, grid_state.occ,
        bound=cfg.bound, cascade=cfg.cascade, grid_size=cfg.grid_size,
        max_steps=max_steps, n_samples=n_samples, noise=noise,
    )                                                   # [N, K, 3], [N, K]

    K = ts.shape[1]
    M = N * K

    if sample_budget is not None and sample_budget < M:
        # evaluate the network only on valid samples, packed into a static
        # budget (the reference's mean_count compaction, deterministic;
        # over-budget samples are dropped like raymarching.py:198-203)
        plan = compact_plan(valid, sample_budget)
        pos_c = gather_compact(plan, pos)
        # directions are constant along a ray: gather [budget] rows from
        # the [N, 3] ray directions (src // K = ray id) instead of
        # materializing and regathering a [N, K, 3] broadcast
        ray_of = jnp.minimum(plan.src_idx // K, N - 1)
        dirs_c = d[ray_of] * plan.slot_used[:, None].astype(d.dtype)
        sig_c, rgb_c = _eval_samples(params, pos_c, dirs_c, cfg,
                                     compute_dtype, eval_chunk, stochastic)
        sigmas = scatter_back(plan, sig_c, M).reshape(N, K)
        rgbs = scatter_back(plan, rgb_c, M).reshape(N, K, cfg.channel_dim)
        valid = plan.new_valid
    else:
        dirs = jnp.broadcast_to(d[:, None, :], (N, K, 3))
        sig_f, rgb_f = _eval_samples(
            params, pos.reshape(M, 3), dirs.reshape(M, 3), cfg,
            compute_dtype, eval_chunk, stochastic,
        )
        sigmas = sig_f.reshape(N, K)
        rgbs = rgb_f.reshape(N, K, cfg.channel_dim)
    sigmas = sigmas * cfg.density_scale                 # renderer.py:106

    weights_sum, depth, image = composite_rays(
        sigmas, rgbs, dt, ts, t0, valid, t_thresh
    )

    bg = jnp.asarray(bg_color, jnp.float32)
    image = image + (1.0 - weights_sum)[:, None] * bg
    span = fars - nears
    depth = jnp.where(
        span > 0, jnp.clip(depth - nears, min=0) / jnp.maximum(span, 1e-10), 0.0
    )

    return {
        "image": image.reshape(*prefix, cfg.channel_dim),
        "depth": depth.reshape(*prefix),
        "weights_sum": weights_sum.reshape(*prefix),
    }
