"""The instant-ngp style NeRF network: hash encoding + sigma/color MLPs.

Functional equivalent of reference nerf/network.py:10-76 (NeRFNetwork built on
tiny-cuda-nn): a NetworkWithInputEncoding (hash grid → sigma MLP emitting
1+geo_feat_dim), an SH direction encoding, and a color MLP.  Params are a
plain pytree; apply functions are pure and jit/vmap/shard_map-safe.

Numerics mirrored from the reference:
  * input rescale x → (x+bound)/(2·bound), d → (d+1)/2   (network.py:43,51)
  * sigma = relu(h[..., 0]) in float32                   (network.py:46)
  * color = sigmoid(color_mlp([sh(d), geo_feat]))        (network.py:59)
  * MLPs are bias-free, 128 wide (tcnn FullyFusedMLP; config.py:55-72)

TPU notes: the MLPs are 128-wide — one MXU tile — so plain jnp matmuls lower
to full-width MXU ops.  ``compute_dtype=bfloat16`` runs the matmul chain in
bf16 (like tcnn's fp16) with f32 sigma output.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...config import NeRFConfig
from ...ops.activation import trunc_exp
from ...ops.encoding import (
    HashGridParams,
    hash_grid_encode,
    hash_grid_init,
    sh_encoding,
)


class MLPParams(NamedTuple):
    layers: Tuple[jnp.ndarray, ...]   # weight matrices [in, out], bias-free


class NeRFParams(NamedTuple):
    hash: HashGridParams
    sigma_mlp: MLPParams
    color_mlp: MLPParams


def _mlp_init(key, in_dim: int, out_dim: int, width: int, n_hidden: int,
              dtype=jnp.float32) -> MLPParams:
    """He-uniform init over [in → width ×(n_hidden) → out], no biases."""
    dims = [in_dim] + [width] * n_hidden + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, (di, do) in zip(keys, zip(dims[:-1], dims[1:])):
        bound = (6.0 / di) ** 0.5
        layers.append(jax.random.uniform(k, (di, do), dtype, -bound, bound))
    return MLPParams(layers=tuple(layers))


def _mlp_apply(params: MLPParams, x, compute_dtype):
    h = x.astype(compute_dtype)
    for i, w in enumerate(params.layers):
        h = h @ w.astype(compute_dtype)
        if i < len(params.layers) - 1:
            h = jax.nn.relu(h)
    return h


def nerf_init(key, cfg: NeRFConfig) -> NeRFParams:
    k_hash, k_sigma, k_color = jax.random.split(key, 3)
    enc_dim = cfg.encoding_sigma.output_dim            # 32
    sh_dim = cfg.encoding_dir.output_dim               # 16
    return NeRFParams(
        hash=hash_grid_init(k_hash, cfg.encoding_sigma),
        sigma_mlp=_mlp_init(
            k_sigma, enc_dim, 1 + cfg.geo_feat_dim,
            cfg.network_sigma.n_neurons, cfg.network_sigma.n_hidden_layers,
        ),
        color_mlp=_mlp_init(
            k_color, sh_dim + cfg.geo_feat_dim, cfg.channel_dim,
            cfg.network_color.n_neurons, cfg.network_color.n_hidden_layers,
        ),
    )


def nerf_density(params: NeRFParams, x, cfg: NeRFConfig,
                 compute_dtype=jnp.float32,
                 stochastic: bool = False) -> Dict[str, jnp.ndarray]:
    """Density-only query (reference nerf/network.py:63-76).

    Args:
      x: [..., 3] positions in [-bound, bound].
      stochastic: one-corner hash sampling (training fast mode).

    Returns: {'sigma': [...] f32, 'geo_feat': [..., geo_feat_dim]}.
    """
    xn = (x + cfg.bound) / (2 * cfg.bound)
    h = hash_grid_encode(params.hash, xn, cfg.encoding_sigma,
                         custom_bwd=cfg.hash_custom_bwd,
                         stochastic=stochastic,
                         grad_bf16=cfg.hash_grad_bf16,
                         stochastic_min_level=cfg.hash_stochastic_min_level)
    h = _mlp_apply(params.sigma_mlp, h, compute_dtype)
    h0 = h[..., 0].astype(jnp.float32)
    if cfg.density_activation == "trunc_exp":
        sigma = trunc_exp(h0)        # torch-ngp original; never dies
    else:
        sigma = jax.nn.relu(h0)      # reference nerf/network.py:46
    return {"sigma": sigma, "geo_feat": h[..., 1:]}


def nerf_color(params: NeRFParams, d, geo_feat, cfg: NeRFConfig,
               compute_dtype=jnp.float32):
    """Color-only query given geo features (reference nerf/network.py:82-112;
    the mask argument is unnecessary under fixed shapes — callers mask via
    the composite weights instead)."""
    dn = (d + 1.0) / 2.0
    sh = sh_encoding(dn, cfg.encoding_dir.degree)
    h = jnp.concatenate([sh.astype(compute_dtype),
                         geo_feat.astype(compute_dtype)], axis=-1)
    h = _mlp_apply(params.color_mlp, h, compute_dtype)
    return jax.nn.sigmoid(h).astype(jnp.float32)


def nerf_apply(params: NeRFParams, x, d, cfg: NeRFConfig,
               compute_dtype=jnp.float32,
               stochastic: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full forward (reference nerf/network.py:39-61).

    Args:
      x: [..., 3] positions in [-bound, bound].
      d: [..., 3] unit directions in [-1, 1].
      stochastic: one-corner hash sampling (training fast mode).

    Returns: (sigma [...] f32, color [..., channel_dim] f32).
    """
    dens = nerf_density(params, x, cfg, compute_dtype, stochastic=stochastic)
    color = nerf_color(params, d, dens["geo_feat"], cfg, compute_dtype)
    return dens["sigma"], color
