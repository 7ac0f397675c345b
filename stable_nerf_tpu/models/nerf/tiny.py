"""tiny-NeRF: frequency encoding + 8-layer MLP + naive stratified sampling.

The minimum end-to-end slice (SURVEY.md §7 build order step 2; BASELINE.md
config 1): the classic NeRF formulation fitted on tiny_nerf_data.npz-style
scenes.  No occupancy grid, no hash tables — pure dense sampling, CPU-runnable
and the parity harness for the reference's tiny-NeRF workload
(reference test_nerf.py:146-200 drives the same data at 128² with Adam).

All pure functions over a params pytree; one jitted train step composes
render + L1/L2 loss + optax.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import TinyNeRFConfig
from ...ops.activation import trunc_exp
from ...ops.encoding import freq_encoding


class TinyNeRFParams(NamedTuple):
    weights: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]
    # rgb head (conditioned on view dirs when cfg.use_viewdirs)
    rgb_w: Tuple[jnp.ndarray, ...]
    rgb_b: Tuple[jnp.ndarray, ...]
    sigma_w: jnp.ndarray
    sigma_b: jnp.ndarray


_SKIP_LAYER = 4  # classic NeRF: re-concat the encoded input at layer 4


def tiny_nerf_init(key, cfg: TinyNeRFConfig) -> TinyNeRFParams:
    pos_dim = 3 * (2 * cfg.n_freqs_pos + 1)
    dir_dim = 3 * (2 * cfg.n_freqs_dir + 1)
    W = cfg.width

    def dense(k, din, dout):
        kw, _ = jax.random.split(k)
        scale = (1.0 / din) ** 0.5
        return (jax.random.uniform(kw, (din, dout), minval=-scale, maxval=scale),
                jnp.zeros(dout))

    keys = jax.random.split(key, cfg.n_layers + 4)
    ws, bs = [], []
    din = pos_dim
    for i in range(cfg.n_layers):
        if i == _SKIP_LAYER:
            din += pos_dim
        w, b = dense(keys[i], din, W)
        ws.append(w)
        bs.append(b)
        din = W

    sigma_w, sigma_b = dense(keys[cfg.n_layers], W, 1)
    if cfg.use_viewdirs:
        fw, fb = dense(keys[cfg.n_layers + 1], W, W)          # feature
        hw, hb = dense(keys[cfg.n_layers + 2], W + dir_dim, W // 2)
        ow, ob = dense(keys[cfg.n_layers + 3], W // 2, 3)
        rgb_w, rgb_b = (fw, hw, ow), (fb, hb, ob)
    else:
        ow, ob = dense(keys[cfg.n_layers + 1], W, 3)
        rgb_w, rgb_b = (ow,), (ob,)

    return TinyNeRFParams(tuple(ws), tuple(bs), rgb_w, rgb_b, sigma_w, sigma_b)


def tiny_nerf_apply(params: TinyNeRFParams, x, d, cfg: TinyNeRFConfig):
    """x: [..., 3] positions; d: [..., 3] unit view dirs.

    Returns (sigma [...], rgb [..., 3]); sigma pre-activation (relu applied
    in the renderer, standard NeRF).
    """
    xe = freq_encoding(x, cfg.n_freqs_pos, include_input=True)
    h = xe
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        if i == _SKIP_LAYER:
            h = jnp.concatenate([h, xe], axis=-1)
        h = jax.nn.relu(h @ w + b)

    sigma = (h @ params.sigma_w + params.sigma_b)[..., 0]

    if cfg.use_viewdirs:
        de = freq_encoding(d, cfg.n_freqs_dir, include_input=True)
        fw, hw, ow = params.rgb_w
        fb, hb, ob = params.rgb_b
        feat = h @ fw + fb
        h2 = jax.nn.relu(jnp.concatenate([feat, de], axis=-1) @ hw + hb)
        rgb = jax.nn.sigmoid(h2 @ ow + ob)
    else:
        (ow,), (ob,) = params.rgb_w, params.rgb_b
        rgb = jax.nn.sigmoid(h @ ow + ob)
    return sigma, rgb


def render_tiny(
    params: TinyNeRFParams,
    rays_o,
    rays_d,
    cfg: TinyNeRFConfig,
    *,
    key: Optional[jax.Array] = None,
    white_bg: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Stratified-sampling volume render.

    Args:
      rays_o, rays_d: [..., 3].
      key: if given, jitter samples within their stratified bins (training).

    Returns {'image': [..., 3], 'depth': [...], 'weights_sum': [...]}.
    """
    prefix = rays_o.shape[:-1]
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    N, S = o.shape[0], cfg.n_samples

    edges = jnp.linspace(cfg.near, cfg.far, S + 1)
    lower, upper = edges[:-1], edges[1:]
    if key is not None:
        u = jax.random.uniform(key, (N, S))
    else:
        u = jnp.full((N, S), 0.5)
    ts = lower[None, :] + (upper - lower)[None, :] * u             # [N, S]

    pos = o[:, None, :] + ts[..., None] * d[:, None, :]
    dirs = jnp.broadcast_to(d[:, None, :], pos.shape)
    sigma, rgb = tiny_nerf_apply(params, pos, dirs, cfg)

    deltas = jnp.diff(ts, axis=-1)
    # final delta = mean bin width (NOT the classic 1e10: with a strictly
    # positive exp density that would pin the last alpha to 1 and swallow
    # the background)
    bin_w = jnp.full((N, 1), (cfg.far - cfg.near) / S)
    deltas = jnp.concatenate([deltas, bin_w], axis=-1)
    # trunc_exp density (never-dead gradient; reference activation.py:6-19)
    alpha = 1.0 - jnp.exp(-trunc_exp(sigma - 1.0) * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones((N, 1)), trans[:, :-1]], axis=-1)
    weights = alpha * trans                                        # [N, S]

    image = jnp.einsum("ns,nsc->nc", weights, rgb)
    depth = jnp.sum(weights * ts, axis=-1)
    ws = jnp.sum(weights, axis=-1)
    if white_bg:
        image = image + (1.0 - ws)[:, None]

    return {
        "image": image.reshape(*prefix, 3),
        "depth": depth.reshape(*prefix),
        "weights_sum": ws.reshape(*prefix),
    }
