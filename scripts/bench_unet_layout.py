#!/usr/bin/env python
"""Isolate the two U-Net perf suspects on real TPU.

The SDXL denoise step runs at 5.8% MFU (28.6 ms vs ~1.7 ms
speed-of-light).  Two structural candidates:

1. **NCHW activations** (kept for torch-weight semantics): XLA TPU is
   NHWC-native and wraps every conv in layout transposes.  Measures a
   resnet-ish conv chain (conv→GN→silu→conv) at SDXL's three
   resolutions in both layouts.
2. **f32 attention logits**: sdpa computes QK^T in f32 (8× slower MXU
   path than bf16×bf16→f32 accumulate).  Measures SDPA at the U-Net's
   two attention shapes with f32 logits vs bf16 logits +
   preferred_element_type=f32.

Usage: python scripts/bench_unet_layout.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _force(x):
    return jax.device_get(x[(0,) * x.ndim])


def timeit_scanned(fn, x, *args, iters=100):
    """Time fn iterated inside ONE jitted lax.scan — axon's per-dispatch
    RPC overhead (~1 ms) otherwise drowns sub-ms ops."""

    @jax.jit
    def run(x, *args):
        def body(h, _):
            return fn(h, *args).astype(h.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    _force(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x, *args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def conv_chain_nchw(x, k1, k2, scale, bias):
    dn = ("NCHW", "OIHW", "NCHW")
    h = jax.lax.conv_general_dilated(x, k1, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
    mu = jnp.mean(h.astype(jnp.float32), axis=(2, 3), keepdims=True)
    var = jnp.var(h.astype(jnp.float32), axis=(2, 3), keepdims=True)
    h = ((h - mu) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
    h = h * scale[None, :, None, None] + bias[None, :, None, None]
    h = h * jax.nn.sigmoid(h)
    return jax.lax.conv_general_dilated(h, k2, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


def conv_chain_nhwc(x, k1, k2, scale, bias):
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(x, k1, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
    mu = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
    var = jnp.var(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
    h = ((h - mu) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
    h = h * scale[None, None, None, :] + bias[None, None, None, :]
    h = h * jax.nn.sigmoid(h)
    return jax.lax.conv_general_dilated(h, k2, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


def sdpa_f32(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def sdpa_bf16(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", (q * scale).astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def main():
    key = jax.random.PRNGKey(0)
    B = 2
    print("conv chain (conv3x3→GN-ish→silu→conv3x3), bf16, batch 2:")
    for c, hw in ((320, 64), (640, 32), (1280, 16)):
        x = jax.random.normal(key, (B, c, hw, hw), jnp.bfloat16)
        k1 = jax.random.normal(key, (c, c, 3, 3), jnp.bfloat16) * 0.02
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        t_nchw = timeit_scanned(conv_chain_nchw, x, k1, k1, scale, bias)
        xh = x.transpose(0, 2, 3, 1)
        kh = k1.transpose(2, 3, 1, 0)
        t_nhwc = timeit_scanned(conv_chain_nhwc, xh, kh, kh, scale, bias)
        flops = 2 * 2 * B * hw * hw * c * c * 9
        print(f"  c={c:4d} {hw}x{hw}: NCHW {t_nchw:6.2f} ms  NHWC {t_nhwc:6.2f} ms "
              f"(NHWC mfu={flops / (t_nhwc * 1e-3) / 197e12:.2%})")

    print("SDPA, batch 2:")
    for heads, s, d in ((10, 1024, 64), (20, 256, 64)):
        q = jax.random.normal(key, (B, heads, s, d), jnp.bfloat16)
        t32 = timeit_scanned(lambda h, k, v: sdpa_f32(h, k, v), q, q, q)
        t16 = timeit_scanned(lambda h, k, v: sdpa_bf16(h, k, v), q, q, q)
        print(f"  H={heads} S={s} D={d}: f32-logits {t32:6.2f} ms  "
              f"bf16-logits {t16:6.2f} ms")


if __name__ == "__main__":
    main()
