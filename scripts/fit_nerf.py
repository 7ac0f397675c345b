#!/usr/bin/env python
"""Standalone NeRF fitting driver — the PSNR parity harness.

Workload equivalent of reference test_nerf.py:146-200 (train_nerf): fit
the occupancy-grid NeRF on the paired dataset's reference views and
report per-view PSNR after overfitting.

The default *recipe* is torch-ngp's (the system the reference's NeRF is
built from), not the reference driver's, because the reference recipe is
measurably unstable on this model class:

  * random-ray minibatches drawn across ALL views each step (torch-ngp
    trainer), not one whole-image view per step (reference
    test_nerf.py:170-183).  Whole-image single-view steps at lr 1e-2
    crash the density field into deep underflow in the first epoch
    (measured: sigma→e⁻²³ after 64 steps, gradients →1e-10, fit dead).
  * MSE loss (torch-ngp) by default — amplifies the sparse
    foreground-residual signal relative to the near-converged
    background; --loss l1 gives the reference's l1_loss (loss_utils.py:9).
  * trunc_exp density (torch-ngp nerf/activation.py; the reference
    defines it but uses ReLU, which has a global zero-gradient death
    mode) — --density-act relu restores reference behavior.
  * occupancy refresh every --update-every steps (torch-ngp's 16), not
    once per epoch.

Reference-matching knobs kept: Adam(1e-2, betas (0.9, 0.99), eps 1e-15)
(test_nerf.py:160), max_steps 256, grid 128³, bg_color flag
(test_nerf.py:165 uses 0; tiny-NeRF-style data has a white background,
for which --bg 1 keeps empty space empty and occupancy sparse).

Usage: python scripts/fit_nerf.py [--dataset synthetic|nerf] [--data-root datasets]
       [--steps 3000] [--size 128] [--bg 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic",
                    help="synthetic (committed parity scene) | nerf "
                         "(real tiny-NeRF, requires download)")
    ap.add_argument("--data-root", default="datasets")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--rays-per-batch", type=int, default=4096)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--lr-decay", type=float, default=0.1,
                    help="final lr as a fraction of --lr, exponential "
                         "schedule (torch-ngp's LambdaLR decay); 1 = "
                         "constant (measured: constant 1e-2 oscillates "
                         "and degrades PSNR after ~1250 steps)")
    ap.add_argument("--max-steps", type=int, default=256)
    ap.add_argument("--out", default="debug_out")
    ap.add_argument("--grid-size", type=int, default=128)
    ap.add_argument("--bg", type=float, default=1.0,
                    help="compositing background (reference test_nerf.py:165 "
                         "uses 0; 1 suits white-background data)")
    ap.add_argument("--loss", default="mse", choices=["mse", "l1"])
    ap.add_argument("--sample-budget", default="0",
                    help="max NeRF-evaluated samples per train step "
                         "(mean_count semantics); 0 = dense; 'auto' = "
                         "adaptive per occupancy refresh "
                         "(ops.compaction.suggest_sample_budget — the "
                         "reference's adaptive mean_count pool).  "
                         "WARNING: a fixed budget that BINDS during the "
                         "early fog phase truncates rays mid-flight and "
                         "the background leaks through the cut — "
                         "measured to crash the density field into "
                         "trunc_exp's dead zone within ~3 steps at "
                         "lr 1e-2.  The reference never trains in that "
                         "regime (mean_count adapts UP in the fog phase, "
                         "raymarching.py:198-203); train dense, use "
                         "'auto', or make the budget generous")
    ap.add_argument("--stochastic", action="store_true",
                    help="hash_stochastic training fast mode")
    ap.add_argument("--stochastic-until", type=int, default=0,
                    help="warmup schedule: train the first N steps with the "
                         "stochastic one-corner encode (0.29 s/step vs "
                         "1.57 exact on v5e), then switch to the exact "
                         "8-corner encode for final quality; 0 = no "
                         "schedule.  Unlike --stochastic (stochastic "
                         "throughout), this targets the exact-mode PSNR "
                         "ceiling at a fraction of the wall time")
    ap.add_argument("--stochastic-min-level", type=int, default=0,
                    help="with --stochastic: keep exact 8-corner interp "
                         "on levels below this index (hybrid fast mode); "
                         "0 = fully stochastic")
    ap.add_argument("--density-act", default="trunc_exp",
                    choices=["trunc_exp", "relu"])
    ap.add_argument("--no-custom-bwd", action="store_true",
                    help="route hash-table grads through XLA scatter-add "
                         "instead of the Pallas kernel (debug/isolation)")
    ap.add_argument("--update-every", type=int, default=16,
                    help="occupancy-grid refresh cadence in steps")
    ap.add_argument("--psnr-views", type=int, default=8,
                    help="views averaged for the final PSNR report")
    ap.add_argument("--log-every", type=int, default=250)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.nerf import (
        grid_init, mark_untrained_grid, nerf_density, nerf_init, render,
        update_extra_state,
    )
    from stable_nerf_tpu.utils.losses import psnr
    from stable_nerf_tpu.utils.visualization import save_image

    H = W = args.size
    from stable_nerf_tpu.ops.compaction import suggest_sample_budget

    import dataclasses

    cfg = NeRFConfig(channel_dim=3, grid_size=args.grid_size,
                     hash_stochastic=args.stochastic,
                     hash_stochastic_min_level=args.stochastic_min_level,
                     density_activation=args.density_act,
                     hash_custom_bwd=not args.no_custom_bwd)
    # the warmup config: same params/tables, one-corner encode
    cfg_sto = dataclasses.replace(
        cfg, hash_stochastic=True,
        hash_stochastic_min_level=args.stochastic_min_level)
    auto_budget = args.sample_budget == "auto"
    budget = None if auto_budget else (
        int(args.sample_budget) if int(args.sample_budget) > 0 else None)
    ds = StableNeRFDataset(args.dataset, shape=(H, W), encoded_shape=(H, W),
                           root=args.data_root)
    n = len(ds)
    print(f"{n} views at {H}x{W}; {args.steps} steps x "
          f"{args.rays_per_batch} rays, loss={args.loss}, "
          f"act={args.density_act}, bg={args.bg}", flush=True)

    key = jax.random.PRNGKey(0)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, ds.intrinsic, cfg)
    )(state, jnp.asarray(ds.reference_poses))

    if args.lr_decay < 1.0:
        sched = optax.exponential_decay(
            args.lr, args.steps, args.lr_decay)
        opt = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)
    else:
        opt = optax.adam(args.lr, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    images = jnp.asarray(ds.reference_images)           # [N, 3, H, W]
    gts = (images.transpose(0, 2, 3, 1).reshape(n, -1, 3) + 1.0) / 2.0
    rays_o = jnp.asarray(ds.reference_rays["rays_o"])   # [N, HW, 3]
    rays_d = jnp.asarray(ds.reference_rays["rays_d"])
    pool_o = rays_o.reshape(-1, 3)                      # [N*HW, 3]
    pool_d = rays_d.reshape(-1, 3)
    pool_gt = gts.reshape(-1, 3)

    step_cache = {}

    def make_train_step(b, stochastic=False):
        """One traced step per distinct (budget bucket, encode mode) — auto
        mode cycles through at most log2(max_steps) buckets, the warmup
        schedule through two modes."""
        if (b, stochastic) in step_cache:
            return step_cache[(b, stochastic)]
        step_cfg = cfg_sto if stochastic else cfg

        @jax.jit
        def train_step(params, opt_state, state, key):
            k_idx, k_perturb = jax.random.split(key)
            idx = jax.random.randint(k_idx, (args.rays_per_batch,), 0,
                                     pool_o.shape[0])
            o, d, gt = pool_o[idx], pool_d[idx], pool_gt[idx]

            def loss_fn(p):
                out = render(p, state, o[None], d[None], step_cfg,
                             bg_color=args.bg, max_steps=args.max_steps,
                             perturb_key=k_perturb,
                             compute_dtype=jnp.bfloat16, sample_budget=b)
                err = out["image"][0] - gt
                if args.loss == "mse":
                    return jnp.mean(err ** 2)
                return jnp.mean(jnp.abs(err))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        step_cache[(b, stochastic)] = train_step
        return train_step

    @jax.jit
    def eval_view(params, state, o, d):
        return render(params, state, o[None], d[None], cfg, bg_color=args.bg,
                      max_steps=args.max_steps)["image"][0]

    def density_fn(params):
        return lambda x: nerf_density(params, x, cfg)["sigma"]

    update = jax.jit(lambda s, p, k: update_extra_state(s, density_fn(p), k, cfg))

    def view_psnr(i):
        pred = eval_view(params, state, rays_o[i], rays_d[i])
        return pred, float(psnr(
            pred.reshape(1, H, W, 3).transpose(0, 3, 1, 2),
            gts[i].reshape(1, H, W, 3).transpose(0, 3, 1, 2))[0, 0])

    os.makedirs(args.out, exist_ok=True)
    if args.stochastic and args.stochastic_until:
        sys.exit("--stochastic (one-corner throughout) and "
                 "--stochastic-until (warmup schedule, exact finish) are "
                 "mutually exclusive — pick one")
    t0 = time.time()
    cur_budget = budget

    def warming(step):
        return args.stochastic or step < args.stochastic_until

    for step in range(args.steps):
        if step % args.update_every == 0:
            key, k_grid = jax.random.split(key)
            state = update(state, params, k_grid)
            if auto_budget:
                cur_budget = suggest_sample_budget(
                    float(jnp.mean(state.occ)),
                    args.rays_per_batch, args.max_steps)
        if step == args.stochastic_until and args.stochastic_until:
            print(f"step {step}: warmup over — switching to the exact "
                  f"8-corner encode", flush=True)
        train_step = make_train_step(cur_budget, warming(step))
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, state, k)
        if (step + 1) % args.log_every == 0 or step == 0:
            pred, p = view_psnr(0)
            occ = float(jnp.mean(state.occ.astype(jnp.float32)))
            print(f"step {step + 1}: loss {float(loss):.6f} view0 PSNR "
                  f"{p:.2f} occ {occ:.3f} {time.time() - t0:.0f}s", flush=True)
            save_image(os.path.join(args.out, f"pred_{step + 1}.png"),
                       np.asarray(pred).reshape(H, W, 3))
            save_image(os.path.join(args.out, "gt.png"),
                       np.asarray(gts[0]).reshape(H, W, 3))

    # final multi-view PSNR (the parity number: reference test_nerf.py
    # reports per-view quality after overfitting)
    ps = []
    for i in range(min(args.psnr_views, n)):
        ps.append(view_psnr(i)[1])
    print(f"FINAL: mean PSNR over {len(ps)} views = {np.mean(ps):.2f} dB "
          f"(per-view: {['%.2f' % v for v in ps]})", flush=True)


if __name__ == "__main__":
    main()
