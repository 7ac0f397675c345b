"""Occupancy-grid state and maintenance.

Functional equivalent of the reference NeRFRenderer's density-grid machinery
(reference nerf/renderer.py:28-48 state, :174-234 mark_untrained_grid,
:236-327 update_extra_state), redesigned for TPU:

  * the grid lives in **linear (x·H² + y·H + z) order**, not Morton order —
    Morton locality buys nothing for XLA gathers (documented divergence;
    ops/morton.py exists for bit-parity conversion of checkpoints);
  * occupancy is a plain bool array, not a packed bitfield (packing only
    saves HBM traffic the TPU gather doesn't do bytewise anyway);
  * "random sample of occupied cells" uses `jax.random.categorical` over the
    occupancy mask — identical in distribution to the reference's
    index-list + randint resampling (renderer.py:284-286) but fixed-shape;
  * everything is jit-safe: the full/partial sweep choice is a
    `lax.cond` on the device-resident iteration counter.

The reference's step_counter/mean_count machinery (renderer.py:43-47,321-325)
exists only to size its compacted CUDA buffers; the fixed-shape march has no
such buffer, so it is intentionally absent (SURVEY.md §7 delta 1).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...config import NeRFConfig


class OccupancyGridState(NamedTuple):
    density_grid: jnp.ndarray   # [CAS, H³] f32; -1 marks untrainable cells
    occ: jnp.ndarray            # [CAS, H, H, H] bool
    mean_density: jnp.ndarray   # f32 scalar
    iter_density: jnp.ndarray   # int32 scalar


def grid_init(cfg: NeRFConfig) -> OccupancyGridState:
    H, C = cfg.grid_size, cfg.cascade
    return OccupancyGridState(
        density_grid=jnp.zeros((C, H ** 3), jnp.float32),
        occ=jnp.zeros((C, H, H, H), bool),
        mean_density=jnp.float32(0.0),
        iter_density=jnp.int32(0),
    )


def reset_extra_state(cfg: NeRFConfig) -> OccupancyGridState:
    """Zero all grid state (reference renderer.py:60-68 reset_extra_state;
    note -1 untrained markers are also cleared, as there)."""
    return grid_init(cfg)


def _cell_coords(H: int):
    """[H³, 3] int32 cell coordinates in linear order."""
    r = jnp.arange(H, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def _cascade_bounds(cfg: NeRFConfig, cas: int) -> Tuple[float, float]:
    bound = min(2 ** cas, cfg.bound)
    return bound, bound / cfg.grid_size


def mark_untrained_grid(
    state: OccupancyGridState, poses, intrinsic, cfg: NeRFConfig
) -> OccupancyGridState:
    """Mark cells outside every camera frustum as permanently untrainable (−1).

    Mirrors reference renderer.py:174-234: a cell is covered by a camera if
    its center maps in front of the camera (z > 0) within the pinhole frustum
    widened by 2·half_grid_size.  The reference's 5-deep chunk loop becomes a
    single scan over poses with the full cell grid vectorized.

    Args:
      poses: [B, 4, 4] cam2world.
      intrinsic: (fx, fy, cx, cy).
    """
    H = cfg.grid_size
    poses = jnp.asarray(poses, jnp.float32)
    fx, fy, cx, cy = [float(v) for v in intrinsic]
    coords = _cell_coords(H)
    world = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0       # [H³, 3]

    counts = []
    for cas in range(cfg.cascade):
        bound, hgs = _cascade_bounds(cfg, cas)
        cw = world * (bound - hgs)                                  # [H³, 3]

        def body(count, pose):
            # world2cam: (x − t) @ R for c2w rotation R (renderer.py:218-219)
            cam = (cw - pose[:3, 3][None, :]) @ pose[:3, :3]
            mz = cam[:, 2] > 0
            mx = jnp.abs(cam[:, 0]) < cx / fx * cam[:, 2] + hgs * 2
            my = jnp.abs(cam[:, 1]) < cy / fy * cam[:, 2] + hgs * 2
            return count + (mz & mx & my).astype(jnp.int32), None

        count, _ = jax.lax.scan(body, jnp.zeros(H ** 3, jnp.int32), poses)
        counts.append(count)

    count = jnp.stack(counts)                                       # [CAS, H³]
    grid = jnp.where(count == 0, -1.0, state.density_grid)
    return state._replace(density_grid=grid)


def update_extra_state(
    state: OccupancyGridState,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key,
    cfg: NeRFConfig,
    decay: float = 0.95,
    chunk: int = 2 ** 16,
) -> OccupancyGridState:
    """Epoch-cadence density-grid refresh (reference renderer.py:236-327).

    First 16 updates: full 128³ sweep per cascade.  After: ¼ random cells +
    an equal resample of currently-occupied cells.  Then EMA
    ``max(decay·old, new)`` on doubly-valid cells, mean density, and
    re-thresholding into the bool occupancy at
    ``min(mean_density, density_thresh)``.

    Args:
      density_fn: x [M, 3] in [-bound, bound] → sigma [M] (already scaled by
        density_scale, as the reference applies it at renderer.py:271).
      key: PRNG key for the jitter noise and partial sampling.
    """
    H, C = cfg.grid_size, cfg.cascade
    H3 = H ** 3
    coords_all = _cell_coords(H)

    def eval_density_chunked(xyzs):
        m = xyzs.shape[0]
        n_chunks = max(m // chunk, 1)
        if m % chunk == 0 and n_chunks > 1:
            out = jax.lax.map(density_fn, xyzs.reshape(n_chunks, -1, 3))
            return out.reshape(-1)
        return density_fn(xyzs)

    def sweep_cascade(cas: int, cell_idx, key):
        """Evaluate jittered cell centers of one cascade → sigmas."""
        bound, hgs = _cascade_bounds(cfg, cas)
        coords = coords_all[cell_idx]
        xyzs = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0
        xyzs = xyzs * (bound - hgs)
        noise = jax.random.uniform(key, xyzs.shape, minval=-1.0, maxval=1.0)
        xyzs = xyzs + noise * hgs
        return eval_density_chunked(xyzs)

    def full_update(key):
        tmp = -jnp.ones((C, H3), jnp.float32)
        keys = jax.random.split(key, C)
        for cas in range(C):
            sig = sweep_cascade(cas, jnp.arange(H3), keys[cas])
            tmp = tmp.at[cas].set(sig)
        return tmp

    def partial_update(key):
        N = H3 // 4
        tmp = -jnp.ones((C, H3), jnp.float32)
        keys = jax.random.split(key, 3 * C).reshape(C, 3, 2)
        for cas in range(C):
            k_rand, k_occ, k_noise = keys[cas]
            rand_idx = jax.random.randint(k_rand, (N,), 0, H3)
            # uniform-with-replacement over occupied cells via inverse-CDF
            # (cumsum + searchsorted).  NOT jax.random.categorical: with
            # shape (N,) over [H³] logits it materializes an N×H³ gumbel
            # intermediate (~10¹² elements at 128³) — measured 27 s/refresh
            # vs <0.1 s for this formulation.
            occ_mask = state.density_grid[cas] > 0
            cnt = jnp.cumsum(occ_mask.astype(jnp.int32))
            total = cnt[-1]
            u = jax.random.uniform(k_occ, (N,))
            r = jnp.floor(u * total).astype(jnp.int32)   # uniform [0, total)
            occ_idx = jnp.searchsorted(cnt, r, side="right").astype(jnp.int32)
            occ_idx = jnp.minimum(occ_idx, H3 - 1)
            # no occupied cells yet → fall back to uniform over all cells
            occ_idx = jnp.where(total > 0, occ_idx,
                                jax.random.randint(k_occ, (N,), 0, H3))
            idx = jnp.concatenate([rand_idx, occ_idx])
            sig = sweep_cascade(cas, idx, k_noise)
            tmp = tmp.at[cas, idx].set(sig)
        return tmp

    k_branch, key = jax.random.split(key)
    tmp_grid = jax.lax.cond(
        state.iter_density < 16, full_update, partial_update, k_branch
    )

    # EMA max-decay on cells valid in both grids (renderer.py:310-312)
    valid = (state.density_grid >= 0) & (tmp_grid >= 0)
    grid = jnp.where(
        valid, jnp.maximum(state.density_grid * decay, tmp_grid),
        state.density_grid,
    )
    mean_density = jnp.mean(jnp.clip(grid, min=0))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    occ = (grid > thresh).reshape(C, H, H, H)
    return OccupancyGridState(
        density_grid=grid,
        occ=occ,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )
