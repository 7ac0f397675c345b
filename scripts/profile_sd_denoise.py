#!/usr/bin/env python
"""Trace-derived time accounting for the SDXL denoise step (VERDICT r2 #2).

Runs the exact bench.py denoise workload (full SDXL U-Net + IP attention,
batch 2, 64^2 latents, bf16, 10-step jitted DDIM scan) under
``jax.profiler.trace``, parses the captured xplane with
``jax.profiler.ProfileData``, and buckets device time into
conv / matmul / attention-bmm / elementwise+norm / copies / other —
plus the device-idle gap (wall - busy).

Output: one JSON line with the bucket table and the reconciled MFU
(analytic FLOPs from stable_nerf_tpu.utils.flops — cost_analysis()
undercounts TPU conv FLOPs ~9x, which is what made 49%-of-peak read as
5.25% in BENCH_r02; see ARCHITECTURE.md MFU study).

Usage: python scripts/profile_sd_denoise.py [--steps 10] [--outdir DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_denoise(n_steps: int):
    import jax
    import jax.numpy as jnp

    from stable_nerf_tpu.config import SchedulerConfig
    from stable_nerf_tpu.models.diffusion import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.unet import (
        sdxl_unet_config, unet_apply, unet_init,
    )

    cfg = sdxl_unet_config()
    scheduler = DDIMScheduler.create(SchedulerConfig())
    B, H = 2, 64

    @jax.jit
    def init_bf16(key):
        p = unet_init(key, cfg, with_ip=True)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    key = jax.random.PRNGKey(0)
    params = jax.block_until_ready(init_bf16(key))

    ip_tokens = jnp.zeros((B, 4, cfg.cross_attention_dim), jnp.bfloat16)
    text_embeds = jnp.zeros((B, cfg.pooled_projection_dim))
    time_ids = jnp.broadcast_to(
        jnp.asarray([[1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]]), (B, 6))
    latents0 = jax.random.normal(key, (B, 4, H, H))
    ts = jnp.asarray(scheduler.timesteps(n_steps))

    @jax.jit
    def denoise(params, latents):
        def body(x, t):
            eps = unet_apply(params, x, t, ip_tokens,
                             added_text_embeds=text_embeds,
                             added_time_ids=time_ids, cfg=cfg,
                             compute_dtype=jnp.bfloat16)
            x, _ = scheduler.step(eps, t, x, num_inference_steps=n_steps)
            return x, None
        out, _ = jax.lax.scan(body, latents, ts)
        return out

    return cfg, denoise, params, latents0, B, H


# Event names on the 'XLA Ops' line carry the FULL HLO instruction text,
# e.g.  "%convert_reduce_fusion.466 = (f32[16,320]{...}, ...) fusion(
#        bf16[320,320,3,3]{...} %custom-call.439, ...), kind=kOutput, ..."
# so classification has to parse the text:
#   - the leading %ident encodes the fusion's descriptive name
#   - control-flow parents (%while, %conditional, %call) duplicate their
#     children's wall time and must be excluded
#   - convs appear as kOutput fusions whose operand list includes a 4-D
#     weight  bf16[O,I,kh,kw]  (XLA:TPU fuses conv + the following
#     group-norm statistics reduce into one 'convert_reduce_fusion')
#   - matmuls appear as kOutput fusions with a 2-D weight operand
#   - the Pallas flash-attention kernel is custom_call_target=
#     "tpu_custom_call"
_IDENT = re.compile(r"%([a-zA-Z][\w-]*?)((?:\.\w+)*) =")
_CONTROL = {"while", "conditional", "call", "tuple", "get-tuple-element"}
# operand type like  bf16[320,320,3,3]{  — a conv weight (kh,kw ∈ {1,3,5})
_CONV_W = re.compile(r"\[\d+,\d+,([135]),([135])\]\{")
_MM_W = re.compile(r"(?:bf16|f32)\[\d+,\d+\]\{")
_LAYOUT = re.compile(
    r"^(copy|bitcast|reshape|transpose|slice|pad|concatenate|broadcast"
    r"|reverse|gather|dynamic[-_]slice|dynamic[-_]update[-_]slice"
    r"|copy[-_](start|done)|slice[-_](start|done))($|_)")


def classify(text: str) -> str:
    m = _IDENT.match(text)
    base = m.group(1) if m else text[:40]
    if base in _CONTROL:
        return "skip"
    if 'custom_call_target="tpu_custom_call"' in text:
        return "attention (pallas sdpa)"
    if "convolution" in base or _CONV_W.search(text):
        return "conv"
    if "fusion" in base and "kind=kOutput" in text and _MM_W.search(text):
        return "matmul"
    if _LAYOUT.match(base):
        return "copy/layout"
    if "fusion" in base or "reduce" in base or "convert" in base \
            or "add" in base or "multiply" in base or "select" in base:
        return "elementwise/norm"
    return "other"


def parse_xplane(trace_dir: str):
    """Walk the device plane's 'XLA Ops' line, classify every HLO event,
    and return (buckets_ns, top_ops, module_wall_ns, async_dma_ns)."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])

    buckets = collections.Counter()
    per_op = collections.Counter()
    module_wall_ns = 0.0
    async_dma_ns = 0.0
    for plane in data.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                # the jitted module's wall occupancy on the core
                module_wall_ns += sum(ev.duration_ns for ev in line.events)
            elif line.name == "Async XLA Ops":
                # DMA engine activity overlapped with compute — report
                # separately, never added to core-busy time
                async_dma_ns += sum(ev.duration_ns for ev in line.events)
            elif line.name == "XLA Ops":
                for ev in line.events:
                    b = classify(ev.name)
                    if b == "skip":
                        continue
                    buckets[b] += ev.duration_ns
                    m = _IDENT.match(ev.name)
                    per_op[m.group(1) if m else ev.name[:40]] \
                        += ev.duration_ns
    top = per_op.most_common(12)
    return buckets, top, module_wall_ns, async_dma_ns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--reanalyze", default=None, metavar="TRACE_DIR",
                    help="re-parse an existing trace dir (no TPU run; "
                         "--steps must match the traced run)")
    args = ap.parse_args()

    import time

    from stable_nerf_tpu.utils.flops import unet_forward_flops

    B, H = 2, 64
    peak = None
    if args.reanalyze:
        from stable_nerf_tpu.models.diffusion.unet import sdxl_unet_config

        cfg = sdxl_unet_config()
        trace_dir, step_ms = args.reanalyze, None
        peak = 197e12      # the traced chip (v5e); override by editing
    else:
        import jax

        cfg, denoise, params, latents0, B, H = build_denoise(args.steps)
        jax.block_until_ready(denoise(params, latents0))        # compile

        # timed reference run (same as bench.py best-of-blocks, 1 block)
        t0 = time.perf_counter()
        jax.block_until_ready(denoise(params, latents0))
        wall_s = time.perf_counter() - t0
        step_ms = wall_s / args.steps * 1e3

        trace_dir = args.outdir or tempfile.mkdtemp(
            prefix="sd_denoise_trace_")
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(denoise(params, latents0))
        if "v5 lite" in jax.devices()[0].device_kind:
            peak = 197e12

    buckets, top, module_wall_ns, async_dma_ns = parse_xplane(trace_dir)
    total_ns = sum(buckets.values())
    flops_step = unet_forward_flops(cfg, B, H)
    wall_ms_step = module_wall_ns / 1e6 / args.steps
    if step_ms is None:
        step_ms = wall_ms_step

    result = {
        "workload": f"SDXL U-Net denoise, batch {B}, {H}^2 latents, bf16, "
                    f"{args.steps}-step jitted DDIM scan",
        "step_ms_timed": round(step_ms, 2),
        "module_wall_ms_per_step": round(wall_ms_step, 2),
        "classified_ms_per_step": round(total_ns / 1e6 / args.steps, 2),
        "async_dma_overlapped_ms_per_step": round(
            async_dma_ns / 1e6 / args.steps, 2),
        "buckets_ms_per_step": {
            k: round(v / 1e6 / args.steps, 2)
            for k, v in buckets.most_common()},
        "buckets_pct": {
            k: round(100 * v / total_ns, 1) for k, v in buckets.most_common()},
        "top_ops_ms_per_step": {
            k: round(v / 1e6 / args.steps, 3) for k, v in top},
        "analytic_tflop_per_step": round(flops_step / 1e12, 3),
        "mfu_analytic": round(flops_step / (step_ms / 1e3) / peak, 4)
        if peak else None,
        "trace_dir": trace_dir,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
