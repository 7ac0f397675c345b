"""Error-map guided ray sampling state.

The reference supports importance-sampling rays from a per-image 128×128
error map (utils/graphics_utils.py:56-66 sampling; EMA update at
nerf/network.py:163-184) though its drivers never enable it
(renderer.py:48 error_map=None).  Full functional support here:
`data.rays.get_rays(..., error_map=...)` does the weighted sampling, and
this module holds the init/update half.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def error_map_init(n_images: int, resolution: int = 128) -> jnp.ndarray:
    """[n_images, resolution²] uniform initial error."""
    return jnp.ones((n_images, resolution * resolution), jnp.float32)


def update_error_map(error_map, index, inds_coarse, error):
    """EMA-update sampled cells with fresh per-ray error.

    Mirrors reference nerf/network.py:177-184:
      ema = 0.1·old + 0.9·error ; scatter back at the coarse indices.

    Args:
      error_map: [n_images, R²].
      index: [B] image indices of the batch.
      inds_coarse: [B, N] sampled coarse cells (from get_rays error-map mode).
      error: [B, N] or scalar per-ray error in [0, 1].
    """
    error = jnp.broadcast_to(jnp.asarray(error, jnp.float32), inds_coarse.shape)
    rows = error_map[index]                                   # [B, R²]
    old = jnp.take_along_axis(rows, inds_coarse, axis=1)
    ema = 0.1 * old + 0.9 * error
    new_rows = jax.vmap(lambda r, i, v: r.at[i].set(v))(rows, inds_coarse, ema)
    return error_map.at[index].set(new_rows)
