"""Shared functional NN primitives for the diffusion models (VAE, U-Net).

Param layout convention: plain nested dicts with
  conv:   {"kernel": [O, I, kh, kw], "bias": [O]}        (torch OIHW — keeps
          HF weight conversion a pure reshape-free copy; XLA re-layouts for
          the MXU internally)
  linear: {"kernel": [in, out], "bias": [out]?}
  norm:   {"scale": [C], "bias": [C]}

All activations NCHW to match the reference weights' semantics.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def conv2d(p: Dict, x, stride: int = 1, padding: int = 1):
    """3×3/1×1/4×4 conv, NCHW / OIHW."""
    dn = ("NCHW", "OIHW", "NCHW")
    k = p["kernel"]
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)], dimension_numbers=dn,
    )
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)[None, :, None, None]
    return out


def linear(p: Dict, x):
    out = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def group_norm(p: Dict, x, groups: int = 32, eps: float = 1e-6):
    """GroupNorm over NCHW (stats in float32 for bf16 activations)."""
    n, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(n, groups, c // groups, h, w)
    mu = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, c, h, w)
    out = xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]
    return out.astype(x.dtype)


def layer_norm(p: Dict, x, eps: float = 1e-5):
    mu = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    out = (x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def sdpa(q, k, v):
    """Scaled dot-product attention over [B, H, S, D] (torch SDPA semantics,
    the reference's attention core — attention_processor.py:371-373).

    Logits always ACCUMULATE in float32 (softmax stability).  For bf16
    inputs the QK^T operands stay bf16 — the information is already bf16,
    and upcasting operands would route the matmul onto the ~8× slower
    f32 MXU path; f32 inputs keep the exact f32 matmul (parity tests)."""
    scale = q.shape[-1] ** -0.5
    if q.dtype == jnp.bfloat16:
        logits = jnp.einsum("bhqd,bhkd->bhqk", (q * scale).astype(q.dtype),
                            k, preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                            k.astype(jnp.float32))
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def ring_sdpa(q, k, v, axis: str):
    """Sequence-parallel SDPA over a named mesh axis (ring attention).

    Call under ``shard_map`` with the SEQUENCE dimension sharded over
    ``axis``: ``q``/``k``/``v`` are this device's [B, H, S/n, D] token
    blocks.  Computes the exact softmax(q·kᵀ)·v of the local queries
    against the FULL sequence by rotating the k/v blocks one hop around
    the ring (`lax.ppermute` — each hop rides one adjacent-chip ICI link)
    while folding them into flash-style online-softmax accumulators
    (running max ``m``, normalizer ``l``, weighted value sum ``acc``, all
    float32).  Returns the local [B, H, S/n, D] output block; n·(n-1)/n of
    the logits never materialize on any one device, so both the O(S²)
    logits memory and the attention FLOPs shard n-ways.

    Matches ``sdpa``'s dtype rules: bf16 operands hit the bf16 MXU with
    f32 logit/output accumulation; f32 stays f32 throughout.  Semantically
    identical to ``sdpa`` on the gathered sequence (exact softmax, not an
    approximation); bitwise it differs only by the online-softmax
    re-association.  Single-device axes fall back to ``sdpa``.

    This is the rebuild's sequence-parallelism primitive — the reference
    has no model/sequence parallelism at all (HF Accelerate only
    data-parallelizes, reference train.py:122-126); its attention core is
    torch SDPA (attention_processor.py:371-373).
    """
    n = jax.lax.axis_size(axis)
    if n == 1:
        return sdpa(q, k, v)
    scale = q.shape[-1] ** -0.5
    perm = [(j, (j + 1) % n) for j in range(n)]
    qs = (q * scale).astype(q.dtype)
    B, H, Sq, D = q.shape

    def logits_of(k_blk):
        if q.dtype == jnp.bfloat16:
            return jnp.einsum("bhqd,bhkd->bhqk", qs, k_blk,
                              preferred_element_type=jnp.float32)
        return jnp.einsum("bhqd,bhkd->bhqk", qs.astype(jnp.float32),
                          k_blk.astype(jnp.float32))

    def fold(k_blk, v_blk, m, l, acc):
        s = logits_of(k_blk)                                   # [B,H,Sq,Sk] f32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                        preferred_element_type=jnp.float32)
        acc = acc * corr[..., None] + pv
        return m_new, l, acc

    def rotate_and_fold(carry, _):
        k_blk, v_blk, m, l, acc = carry
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        m, l, acc = fold(k_blk, v_blk, m, l, acc)
        return (k_blk, v_blk, m, l, acc), None

    # fold the resident block first, then rotate-and-fold the other n-1 —
    # n-1 hops total (a fold-then-rotate loop would pay a useless n-th
    # ppermute returning every block home).  Accumulator inits are
    # device-varying over the ring axis (shard_map's vma type system
    # requires the scan carry to stay varying).
    var = lambda x: jax.lax.pcast(x, (axis,), to="varying")
    m, l, acc = fold(k, v,
                     var(jnp.full((B, H, Sq), -jnp.inf, jnp.float32)),
                     var(jnp.zeros((B, H, Sq), jnp.float32)),
                     var(jnp.zeros((B, H, Sq, D), jnp.float32)))
    (_, _, _, l, acc), _ = jax.lax.scan(rotate_and_fold, (k, v, m, l, acc),
                                        None, length=n - 1)
    return (acc / l[..., None]).astype(v.dtype)


def split_heads(x, n_heads: int):
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics with SDXL's flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)
