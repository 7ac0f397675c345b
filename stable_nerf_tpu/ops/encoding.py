"""Input encodings: multiresolution hash grid, spherical harmonics, frequency.

TPU-native equivalents of the tiny-cuda-nn encodings the reference depends on
(reference nerf/network.py:23-32; configs nerf/config.py:47-65):

  * HashGridEncoding — instant-ngp multires hash table (16 levels × 2 features,
    2^19 entries, base res 16, per-level scale ≈ 1.3819).  Implemented as one
    fused gather over a [L·T, F] table; gradients reach the table through
    XLA's gather-transpose (scatter-add), no atomics.
  * sh_encoding — closed-form real spherical harmonics, 4 bands → 16 dims
    (tcnn "SphericalHarmonics degree 4"); input in [0, 1] like tcnn.
  * freq_encoding — classic NeRF sin/cos positional encoding for the
    tiny-NeRF path.

All functions are shape-polymorphic over leading dims and jit/vmap-safe.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import HashGridConfig

# tcnn spatial hash primes (grid.h): {1, 2654435761, 805459861}
_PRIMES = (1, 2654435761, 805459861)


class HashGridParams(NamedTuple):
    table: jnp.ndarray  # [n_levels * table_size, n_features]


def _level_geometry(cfg: HashGridConfig):
    """Per-level (scale, resolution, dense?) following tcnn grid.h:

    scale_l = base · 2^(l·log2 s) − 1;  res_l = ceil(scale_l) + 1;
    dense indexing iff res_l³ <= table_size.
    """
    log2s = math.log2(cfg.per_level_scale)
    scales, resolutions, dense = [], [], []
    for l in range(cfg.n_levels):
        scale = cfg.base_resolution * (2.0 ** (l * log2s)) - 1.0
        res = int(math.ceil(scale)) + 1
        scales.append(scale)
        resolutions.append(res)
        dense.append(res ** 3 <= cfg.table_size)
    return scales, resolutions, dense


def hash_grid_init(key, cfg: HashGridConfig, dtype=jnp.float32) -> HashGridParams:
    """Uniform(-1e-4, 1e-4) init, matching tcnn's default grid init."""
    shape = (cfg.n_levels * cfg.table_size, cfg.n_features_per_level)
    table = jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)
    return HashGridParams(table=table)


def _cell_coords(x, cfg: HashGridConfig, lv0: int = 0, lv1: int | None = None):
    """[M, 3] in [0,1] → (p0 [M, L', 3] int32, w [M, L', 3] f32 fractions)
    for levels [lv0, lv1)."""
    scales, _, _ = _level_geometry(cfg)
    lv1 = cfg.n_levels if lv1 is None else lv1
    # per-level continuous grid coords: pos = x*scale + 0.5 (tcnn pos_fract)
    scale_arr = jnp.asarray(scales[lv0:lv1], jnp.float32)          # [L']
    pos = x[:, None, :] * scale_arr[None, :, None] + 0.5           # [M, L', 3]
    p0 = jnp.floor(pos)
    w = pos - p0                                                   # [M, L', 3]
    return p0.astype(jnp.int32), w


def _flat_index(cpos, cfg: HashGridConfig, lv0: int = 0):
    """Corner coords [M, L', C, 3] (levels lv0..lv0+L'−1) → flat table
    indices [M, L', C] int32.

    Per-level dense strides if the level fits the table, else the tcnn
    spatial hash; +level·T offset into the concatenated table."""
    _, resolutions, dense = _level_geometry(cfg)
    T = cfg.table_size
    Lp = cpos.shape[1]
    res_arr = jnp.asarray(resolutions[lv0:lv0 + Lp], jnp.int32)    # [L']
    dense_arr = jnp.asarray(dense[lv0:lv0 + Lp])                   # [L'] bool
    cx, cy, cz = cpos[..., 0], cpos[..., 1], cpos[..., 2]
    r = res_arr[None, :, None]
    dense_idx = (cx + cy * r + cz * r * r).astype(jnp.uint32)
    hashed = (
        cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    idx = jnp.where(dense_arr[None, :, None], dense_idx, hashed) % jnp.uint32(T)
    level_off = (jnp.arange(lv0, lv0 + Lp, dtype=jnp.uint32)
                 * jnp.uint32(T))[None, :, None]
    return (idx + level_off).astype(jnp.int32)                     # [M, L', C]


def _hash_grid_indices_weights(x, cfg: HashGridConfig, lv0: int = 0,
                               lv1: int | None = None):
    """[M, 3] in [0,1] → (flat_idx [M, L', 8] int32, cw [M, L', 8, 1] f32)
    for levels [lv0, lv1)."""
    p0, w = _cell_coords(x, cfg, lv0, lv1)

    # 8 corner offsets
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
    )                                                              # [8, 3]
    cpos = p0[:, :, None, :] + corners[None, None, :, :]           # [M, L, 8, 3]
    flat_idx = _flat_index(cpos, cfg, lv0)                         # [M, L, 8]

    # trilinear weights in the same corner order
    wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]             # [M, L, 1]
    cw = jnp.stack(
        [
            (1 - wx) * (1 - wy) * (1 - wz),
            (1 - wx) * (1 - wy) * wz,
            (1 - wx) * wy * (1 - wz),
            (1 - wx) * wy * wz,
            wx * (1 - wy) * (1 - wz),
            wx * (1 - wy) * wz,
            wx * wy * (1 - wz),
            wx * wy * wz,
        ],
        axis=2,
    )                                                              # [M, L, 8, 1]
    return flat_idx, cw


def _stateless_uniform3(x, L: int, lv0: int = 0):
    """Position-seeded uniforms: [M, 3] f32 → [M, L, 3] in [0, 1).

    murmur-style bit mixing of the position's float bits, decorrelated
    per level (absolute level ids lv0..lv0+L−1, so sliced calls draw the
    same values as the full-range call) and per axis.  Stateless so the
    stochastic-corner encode stays a pure function of x (training jitters
    x every step via the per-ray perturb, which refreshes the draw)."""
    bx = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    h = (bx[:, 0] * jnp.uint32(_PRIMES[0])
         ^ bx[:, 1] * jnp.uint32(_PRIMES[1])
         ^ bx[:, 2] * jnp.uint32(_PRIMES[2]))                      # [M]
    lvl = jnp.arange(lv0, lv0 + L, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    hh = h[:, None] ^ lvl[None]                                    # [M, L]

    def mix(v, c):
        v = (v ^ (v >> 16)) * jnp.uint32(c)
        v = (v ^ (v >> 13)) * jnp.uint32(0x5BD1E995)
        return v ^ (v >> 16)

    u = jnp.stack(
        [mix(hh, c) for c in (0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)], axis=-1
    )                                                              # [M, L, 3]
    return (u >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))


def _hash_grid_indices_stochastic(x, cfg: HashGridConfig, lv0: int = 0,
                                  lv1: int | None = None):
    """One corner per (sample, level), drawn ∝ its trilinear weight.

    Because trilinear weights factorize per axis, sampling each axis bit
    independently (P[bit=1] = frac) draws corner c with probability
    exactly w_c, so table[c] is an unbiased one-point estimator of the
    trilinear interpolation (and its table gradient of the dense
    gradient).  8× fewer gathers/scatter-updates than the exact path —
    the opt-in TPU fast mode for training (NeRFConfig.hash_stochastic).

    Returns (flat_idx [M, L', 1] int32, cw [M, L', 1, 1] f32 ones) for
    levels [lv0, lv1).
    """
    lv1 = cfg.n_levels if lv1 is None else lv1
    p0, w = _cell_coords(x, cfg, lv0, lv1)
    u = _stateless_uniform3(x, lv1 - lv0, lv0)                     # [M, L', 3]
    bits = (u < w).astype(jnp.int32)                               # [M, L', 3]
    cpos = (p0 + bits)[:, :, None, :]                              # [M, L', 1, 3]
    flat_idx = _flat_index(cpos, cfg, lv0)                         # [M, L', 1]
    cw = jnp.ones((*flat_idx.shape, 1), jnp.float32)
    return flat_idx, cw


def _hash_encode_from_table(table, flat_idx, cw, cfg: HashGridConfig,
                            lv0: int = 0):
    """Weighted corner gather → [M, L·F] features.

    The exact (8-corner) path gathers per level from the [T, F] slice
    rather than once from the flat [L·T, F] table: the coarse dense
    levels' working sets are cache-sized, and XLA's lowering exploits
    that only when the operand itself is small (measured: 186 vs 210 ms
    @ 33.6M gathers → 19.9k vs 16.5k rays/s on the train bench, v5e —
    scripts/bench_encode_split.py).  The stochastic one-corner path
    (C==1, 8× fewer items) keeps the single flat gather: the split's
    per-level overhead outweighs the cache win there (75.6k vs 79.8k
    rays/s measured).  Output values and layout are identical either way."""
    M, L, C = flat_idx.shape
    F = cfg.n_features_per_level
    if C == 1:
        feats = table[flat_idx.reshape(-1)]
        feats = feats.reshape(M, L, C, F)
        return jnp.sum(feats * cw, axis=2).reshape(M, L * F)
    tables = table.reshape(cfg.n_levels, cfg.table_size, F)
    outs = []
    for i in range(L):
        lv = lv0 + i
        local = flat_idx[:, i, :] - lv * cfg.table_size            # [M, C]
        feats = tables[lv][local.reshape(-1)].reshape(M, C, F)
        outs.append(jnp.sum(feats * cw[:, i], axis=1))             # [M, F]
    return jnp.concatenate(outs, axis=-1)                          # [M, L·F]


def _indices_weights(x, cfg: HashGridConfig, stochastic: bool):
    if stochastic:
        return _hash_grid_indices_stochastic(x, cfg)
    return _hash_grid_indices_weights(x, cfg)


def _hash_sections(x, cfg: HashGridConfig, stochastic: bool, min_level: int):
    """The encode as level sections [(lv0, flat_idx, cw), …].

    Pure exact / pure stochastic are one full-range section.  The hybrid
    (stochastic with 0 < min_level < L) is two: exact 8-corner trilinear
    on levels [0, min_level) — the coarse dense levels whose gathers run
    at cache speed anyway — and one-corner sampling on [min_level, L),
    the fine hashed levels that dominate the gather/scatter cost
    (ARCHITECTURE.md encode study)."""
    L = cfg.n_levels
    if not stochastic or min_level >= L:
        return ((0, *_hash_grid_indices_weights(x, cfg)),)
    if min_level <= 0:
        return ((0, *_hash_grid_indices_stochastic(x, cfg)),)
    return (
        (0, *_hash_grid_indices_weights(x, cfg, 0, min_level)),
        (min_level, *_hash_grid_indices_stochastic(x, cfg, min_level, L)),
    )


def _encode_sections(table, sections, cfg: HashGridConfig):
    outs = [_hash_encode_from_table(table, fi, cw, cfg, lv0)
            for lv0, fi, cw in sections]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _hash_encode_custom(table, x, cfg: HashGridConfig, stochastic: bool,
                        grad_bf16: bool, min_level: int):
    return _encode_sections(table, _hash_sections(x, cfg, stochastic,
                                                  min_level), cfg)


def _hash_encode_fwd(table, x, cfg, stochastic, grad_bf16, min_level):
    return _hash_encode_custom(table, x, cfg, stochastic, grad_bf16,
                               min_level), (x,)


def _hash_encode_bwd(cfg, stochastic, grad_bf16, min_level, res, g):
    """Table gradient via the Pallas sorted-block scatter
    (ops/pallas/scatter.py) — ~20× cheaper on TPU than XLA's scatter-add.
    Each level section scatters into its own [L'·T, F] slab (indices
    rebased so the kernel sees levels 0..L'−1); slabs concatenate into
    the full table gradient.  Positions get zero gradient (they come from
    ray data; the reference never propagates into them either)."""
    from .pallas.scatter import hash_scatter_add_per_level

    (x,) = res
    sections = _hash_sections(x, cfg, stochastic, min_level)
    M = x.shape[0]
    F = cfg.n_features_per_level
    T = cfg.table_size
    g = g.reshape(M, cfg.n_levels, 1, F)
    slabs = []
    for lv0, flat_idx, cw in sections:
        Lp = flat_idx.shape[1]
        upd = cw * g[:, lv0:lv0 + Lp]                     # [M, L', C, F]
        slabs.append(hash_scatter_add_per_level(
            flat_idx - lv0 * T, upd, Lp, T, payload_bf16=grad_bf16,
        ))
    table_grad = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs)
    return table_grad, jnp.zeros_like(x)


_hash_encode_custom.defvjp(_hash_encode_fwd, _hash_encode_bwd)


def hash_grid_encode(params: HashGridParams, x, cfg: HashGridConfig,
                     custom_bwd: bool = False, stochastic: bool = False,
                     grad_bf16: bool = False, stochastic_min_level: int = 0):
    """Encode positions.

    Args:
      params: hash table.
      x: [..., 3] positions in [0, 1] (callers rescale from [-bound, bound],
         reference nerf/network.py:43).
      custom_bwd: route the table gradient through the Pallas sorted-block
        scatter kernel (TPU) instead of XLA scatter-add; identical numerics
        up to f32 summation order.  Note: positions receive zero gradient
        on this path.
      stochastic: one-corner-per-level unbiased sampling instead of the
        8-corner trilinear interpolation — 8× fewer table accesses
        (training fast mode; see _hash_grid_indices_stochastic).
      grad_bf16: (custom_bwd only) round table-gradient updates to bf16
        and pack both features per sort payload word — a cheaper backward
        sort at ~1e-3 relative gradient noise (bf16-training order).
      stochastic_min_level: hybrid mode — keep the exact 8-corner encode
        on levels below this (the cheap cache-resident dense levels) and
        sample one corner only from the fine hashed levels.  0 = fully
        stochastic when ``stochastic`` is set; >= n_levels = exact.

    Returns: [..., n_levels * n_features] features.
    """
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)                      # [M, 3]
    out_dim = cfg.n_levels * cfg.n_features_per_level
    if custom_bwd:
        out = _hash_encode_custom(params.table, xf, cfg, stochastic,
                                  grad_bf16, stochastic_min_level)
    else:
        sections = _hash_sections(xf, cfg, stochastic, stochastic_min_level)
        out = _encode_sections(params.table, sections, cfg)
    return out.reshape(*batch_shape, out_dim)


# ---------------------------------------------------------------------------
# Spherical harmonics (4 bands, 16 coefficients)
# ---------------------------------------------------------------------------

def sh_encoding(d, degree: int = 4):
    """Real SH basis up to ``degree`` bands (tcnn SphericalHarmonics).

    Args:
      d: [..., 3] directions in [0, 1] (tcnn convention: callers map from
         [-1, 1] via (d+1)/2, reference nerf/network.py:51).

    Returns: [..., degree²] basis values.
    """
    if degree < 1 or degree > 4:
        raise ValueError("sh_encoding supports 1..4 bands")
    d = d * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]                  # l=0
    if degree >= 2:                                                # l=1
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:                                                # l=2
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:                                                # l=3
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Frequency (sin/cos) encoding — tiny-NeRF path
# ---------------------------------------------------------------------------

def freq_encoding(x, n_freqs: int, include_input: bool = True):
    """γ(p) = (p?, sin(2⁰p), cos(2⁰p), …, sin(2^{L−1}p), cos(2^{L−1}p)).

    Returns [..., D·(2L + include_input)] with the per-frequency blocks
    interleaved (sin then cos per octave), matching the original NeRF.
    """
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)              # [L]
    xb = x[..., None, :] * freqs[:, None]                          # [..., L, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)     # [..., L, 2D]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
