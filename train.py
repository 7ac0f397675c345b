#!/usr/bin/env python
"""Joint Stable-NeRF training/inference driver.

CLI-parity superset of the reference's entry point (reference
train.py:435-511 exposes only --timestamp_args/--inference; every other
hyperparameter is hardcoded at train.py:25-28,139-183).  Here the full config
tree is exposed as flags with the reference's values as defaults.

Usage:
  python train.py                          # joint training (objaverse)
  python train.py --dataset nerf           # tiny-NeRF paired data (download)
  python train.py --dataset synthetic      # committed parity scene, paired
  python train.py --inference --workdir X  # restore + full DDIM inference
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None,
                   help="output directory (default: output_<timestamp>)")
    p.add_argument("--inference", action="store_true",
                   help="skip training; restore checkpoint and run inference")
    p.add_argument("--dataset", default="objaverse",
                   choices=["objaverse", "nerf", "synthetic"])
    p.add_argument("--data-root", default="datasets")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--latent-size", type=int, default=64)
    p.add_argument("--percent-objects", type=float, default=0.0002)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--nerf-lr", type=float, default=None,
                   help="separate NeRF learning rate (hash grids want "
                        "~1e-2; optax.multi_transform); omit for the "
                        "reference's single AdamW lr")
    p.add_argument("--lr-schedule", default="constant",
                   choices=("constant", "exponential", "cosine"),
                   help="constant = reference parity; decay measured +3 dB "
                        "over constant lr on the NeRF fit harness")
    p.add_argument("--lr-decay-steps", type=int, default=100_000,
                   help="optimizer steps over which the decay runs")
    p.add_argument("--lr-decay-factor", type=float, default=0.1,
                   help="final lr = lr x this factor")
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--max-steps", type=int, default=256)
    p.add_argument("--max-steps-eval", type=int, default=512)
    p.add_argument("--inference-every", type=int, default=50)
    p.add_argument("--val-every", type=int, default=1,
                   help="validate every N epochs (1 = reference parity; "
                        "the demo uses 10 — each val pass costs tunnel "
                        "round trips comparable to a demo-scale epoch)")
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sdxl-checkpoint", default=None,
                   help="path to an SDXL checkpoint dir (HF layout); "
                        "random weights if omitted")
    p.add_argument("--sample-budget", default=None,
                   help="NeRF sample budget per step: an int (static), "
                        "'auto' (adaptive mean_count-style buckets per "
                        "occupancy refresh), or omitted for dense")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard_map DP over all local devices")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="model-axis size for a 2-D (data x model) mesh: "
                        "U-Net attention/GEGLU kernels + optimizer state "
                        "shard over it via GSPMD (2/5/10 divide SDXL's "
                        "heads); 1 = off")
    p.add_argument("--fsdp", action="store_true",
                   help="fully-shard the SD params + AdamW moments over the "
                        "data axis (ZeRO-3 via GSPMD); composes with "
                        "--tensor-parallel for a 2-D FSDP x TP mesh")
    p.add_argument("--frozen-bf16", action="store_true",
                   help="store the frozen partition (SDXL U-Net base + VAE) "
                        "in bfloat16 — halves its HBM at identical compute "
                        "dtype; required for full-SDXL joint training on "
                        "one 16 GB chip (must match across --resume)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize U-Net blocks on backward "
                        "(jax.checkpoint): ~33%% more FLOPs for a fraction "
                        "of the activation HBM — for full-SDXL training")
    p.add_argument("--stochastic", action="store_true",
                   help="unbiased one-corner hash-encode fast train mode "
                        "(3.8x faster joint step measured; eval renders "
                        "stay exact)")
    p.add_argument("--stochastic-until-epoch", type=int, default=0,
                   help="warmup schedule: train the first N epochs with the "
                        "stochastic one-corner encode, then switch to the "
                        "exact 8-corner encode (fast early convergence + "
                        "exact-mode final quality); 0 = no schedule")
    p.add_argument("--stochastic-min-level", type=int, default=0,
                   help="with --stochastic: keep levels < this exact "
                        "(hybrid mode; coarse levels are cache-cheap)")
    p.add_argument("--guidance-scale", type=float, default=1.0,
                   help="with --inference: classifier-free guidance scale "
                        "(uncond stream = zeroed image conditioning); 1.0 "
                        "= off, exact reference parity (its CFG is "
                        "commented out, train.py:396-402; intended 10.0)")
    p.add_argument("--save-attn-maps", action="store_true",
                   help="with --inference (unsharded): save the final DDIM "
                        "step's ip-stream cross-attention maps per layer to "
                        "renders/ip_attn_maps_<batch>.npz")
    p.add_argument("--sp", type=int, default=1,
                   help="with --inference: sequence-parallel axis size for "
                        "the DDIM denoise (ring attention over latent "
                        "tokens); composes with --tensor-parallel on a "
                        "(seq x model) mesh")
    p.add_argument("--checkpoint-every", type=int, default=50,
                   help="save a resumable checkpoint every N epochs "
                        "(0 = only at the end; the reference saves only "
                        "once at end of training, train.py:303-308)")
    p.add_argument("--checkpoint-trainable-only", action="store_true",
                   help="checkpoint only the trainable partition + "
                        "optimizer + grid; the frozen SDXL base is rebuilt "
                        "on restore from (seed, --sdxl-checkpoint, "
                        "--frozen-bf16), recorded and verified via the "
                        "checkpoint dir's FORMAT.json (halves the ~9 GB "
                        "full-SDXL checkpoint)")
    p.add_argument("--compile-cache", default=None,
                   help="persistent XLA compilation cache directory "
                        "(default: <repo>/.cache/jax — survives host "
                        "resets; or $STABLE_NERF_COMPILE_CACHE; 'none' "
                        "disables). A preempted full-SDXL job "
                        "relaunching with --resume pays ~25 s of "
                        "compile instead of ~4 min")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint under --workdir "
                        "(params + optimizer + occupancy grid + epoch) and "
                        "continue training from there")
    p.add_argument("--profile-dir", default=None,
                   help="dump a jax.profiler trace of a few steady-state "
                        "train steps here (view with xprof/tensorboard)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "before anything (auto-detects on TPU pod slices; "
                        "the reference's `accelerate launch` analogue)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host off-TPU: coordinator host:port for "
                        "jax.distributed (implies --distributed; pair with "
                        "--num-processes/--process-id)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (smoke tests / CI; pairs with "
                        "--image-size 32 --latent-size 16)")
    p.add_argument("--demo", action="store_true",
                   help="learned-diffusion demo preset: demo-scale U-Net "
                        "(trainable from scratch, --trainable-scope sd), "
                        "scene-pretrained tiny VAE (--vae-checkpoint), "
                        "geometric ray intrinsics, image 64 / latent 16 "
                        "defaults — the offline stand-in for the blocked "
                        "real-SDXL flagship (VERDICT r4 next #1)")
    p.add_argument("--trainable-scope", default=None,
                   choices=("reference", "sd"),
                   help="optimizer coverage: 'reference' = ip heads + NeRF "
                        "(reference train.py:179-182, the default); 'sd' = "
                        "additionally the whole U-Net (the demo's "
                        "from-scratch diffusion).  --demo defaults to 'sd'")
    p.add_argument("--vae-checkpoint", default=None,
                   help="path to a pretrain_tiny_vae.py artifact (.npz): "
                        "overlays the trained VAE params and adopts its "
                        "config (incl. measured latent scaling factor)")
    p.add_argument("--vae-encode", default=None, choices=("sample", "mode"),
                   help="latent-target encode draw: 'sample' = reference "
                        "parity (latent_dist.sample()); 'mode' = "
                        "deterministic — required for a loose-posterior "
                        "tiny VAE (the --demo default)")
    return p


def enable_compile_cache(directory=None):
    """Point JAX's persistent compilation cache at ``directory``.

    Verified to work over the remote TPU backend (second-process compile
    of the cache probe dropped 1.33 s → 0.54 s with entries on disk).
    At full-SDXL scale this is the difference between a resume paying a
    ~12 min recompile and starting in seconds.  Returns the directory or
    None when disabled.

    The default lives INSIDE the repo tree (gitignored), not under
    ``~/.cache``: the home directory is ephemeral on the target hosts
    while the checkout persists, so a home-dir cache silently reverts
    every warm start to a cold one across host resets.
    """
    directory = directory or os.environ.get(
        "STABLE_NERF_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".cache", "jax"))
    if str(directory).lower() in ("", "none", "0", "off"):
        return None
    import jax

    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    return directory


def main(argv=None):
    args = build_parser().parse_args(argv)

    # line-buffer stdout even when redirected to a file: long compiles and
    # slow tunnel transfers otherwise sit on a block buffer for many
    # minutes, making a nohup'd run look hung and losing the tail on kill
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except (AttributeError, ValueError):
        pass

    cache_dir = enable_compile_cache(args.compile_cache)
    if cache_dir:
        print(f"compile cache: {cache_dir}")

    if args.distributed or args.coordinator:
        # must run before any jax dispatch so every host joins the cluster
        # and jax.devices() is the GLOBAL device list
        import jax

        kw = {}
        if args.coordinator:
            if args.num_processes is None or args.process_id is None:
                sys.exit("--coordinator requires --num-processes and "
                         "--process-id")
            kw = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        jax.distributed.initialize(**kw)
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from datetime import datetime

    if args.resume and not args.workdir:
        sys.exit("--resume requires --workdir (the run directory whose "
                 "checkpoints to continue from); without it a fresh "
                 "timestamped workdir would silently restart from scratch")
    workdir = args.workdir or f"output_{datetime.now().strftime('%Y%m%d_%H%M%S')}"

    from stable_nerf_tpu.config import NeRFConfig, SDConfig, TrainConfig
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.training.joint import JointConfig

    vae_overlay = None
    if args.tiny and args.demo:
        sys.exit("--tiny and --demo are distinct presets — pick one")
    if args.vae_checkpoint and not args.demo:
        sys.exit("--vae-checkpoint is the demo VAE overlay — pair it with "
                 "--demo (whose VAEConfig is adopted from the artifact)")
    if args.demo:
        from stable_nerf_tpu.models.diffusion.unet import demo_unet_config
        from stable_nerf_tpu.models.diffusion.vae import (
            VAEConfig, vae_load_npz,
        )

        # demo-scale defaults unless explicitly overridden
        if args.image_size == 512:
            args.image_size = 64
        if args.latent_size == 64:
            args.latent_size = 16
        if args.trainable_scope is None:
            args.trainable_scope = "sd"
        if args.vae_encode is None:
            args.vae_encode = "mode"
        num_tokens = 16
        if args.vae_checkpoint:
            vae_overlay, vae_cfg, vae_meta = vae_load_npz(args.vae_checkpoint)
            if vae_meta.get("latent_size") not in (None, args.latent_size):
                sys.exit(f"--vae-checkpoint was trained at latent "
                         f"{vae_meta['latent_size']}, run wants "
                         f"{args.latent_size}")
            if vae_meta.get("image_size") not in (None, args.image_size):
                sys.exit(f"--vae-checkpoint was trained at image "
                         f"{vae_meta['image_size']}, run wants "
                         f"{args.image_size}")
            print(f"VAE checkpoint: recon "
                  f"{vae_meta.get('recon_psnr_test', float('nan')):.2f} dB "
                  f"test, scaling {vae_cfg.scaling_factor:.3f}")
        else:
            # VAE depth from the image/latent ratio (factor 2^(blocks-1)),
            # mirroring scripts/pretrain_tiny_vae.py
            factor = args.image_size // args.latent_size
            if factor * args.latent_size != args.image_size or \
                    2 ** (factor.bit_length() - 1) != factor:
                sys.exit("--demo needs image-size = latent-size x 2^k")
            vae_cfg = VAEConfig(
                block_out_channels=tuple(
                    32 * 2 ** i for i in range(factor.bit_length())),
                layers_per_block=1, norm_groups=8)
        nerf_cfg = NeRFConfig(channel_dim=4,
                              density_activation="trunc_exp")
        sd_cfg = SDNetworkConfig(
            sd=SDConfig(latent_size=args.latent_size,
                        image_size=args.image_size,
                        cross_attention_dim=64,
                        num_tokens=num_tokens,
                        use_downsampling_layers=False),
            unet=demo_unet_config(num_tokens),
            vae=vae_cfg)
    elif args.tiny:
        from stable_nerf_tpu.config import HashGridConfig
        from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
        from stable_nerf_tpu.models.diffusion.vae import VAEConfig

        nerf_cfg = NeRFConfig(
            channel_dim=4, grid_size=32,
            encoding_sigma=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                          base_resolution=4))
        sd_cfg = SDNetworkConfig(
            sd=SDConfig(latent_size=args.latent_size,
                        image_size=args.image_size, cross_attention_dim=48),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8))
    else:
        nerf_cfg = NeRFConfig(channel_dim=4)
        sd_cfg = SDNetworkConfig(
            sd=SDConfig(latent_size=args.latent_size,
                        image_size=args.image_size))

    import dataclasses

    if args.remat:
        sd_cfg = dataclasses.replace(
            sd_cfg, unet=dataclasses.replace(sd_cfg.unet, remat=True))
    if args.stochastic and args.stochastic_until_epoch:
        sys.exit("--stochastic (one-corner encode throughout) and "
                 "--stochastic-until-epoch (warmup schedule, exact finish) "
                 "are mutually exclusive — pick one")
    if args.stochastic:
        nerf_cfg = dataclasses.replace(
            nerf_cfg, hash_stochastic=True,
            hash_stochastic_min_level=args.stochastic_min_level)
    elif args.stochastic_until_epoch:
        # schedule: the warm epochs' config is derived in the loop by
        # flipping hash_stochastic — carry the hybrid min-level through
        nerf_cfg = dataclasses.replace(
            nerf_cfg, hash_stochastic_min_level=args.stochastic_min_level)

    cfg = JointConfig(
        nerf=nerf_cfg,
        sd=sd_cfg,
        train=TrainConfig(
            batch_size=args.batch_size,
            epochs=args.epochs,
            lr=args.lr,
            nerf_lr=args.nerf_lr,
            lr_schedule=args.lr_schedule,
            lr_decay_steps=args.lr_decay_steps,
            lr_decay_factor=args.lr_decay_factor,
            weight_decay=args.weight_decay,
            max_steps_train=args.max_steps,
            max_steps_eval=args.max_steps_eval,
            inference_every=args.inference_every,
            val_every=args.val_every,
            num_inference_steps=args.num_inference_steps,
            seed=args.seed,
            sample_budget=(None if args.sample_budget in (None, "auto")
                           else int(args.sample_budget)),
            sample_budget_auto=args.sample_budget == "auto",
            stochastic_until_epoch=args.stochastic_until_epoch,
            frozen_dtype="bfloat16" if args.frozen_bf16 else None,
            trainable_scope=args.trainable_scope or "reference",
            vae_encode=args.vae_encode or "sample",
            checkpoint_every=args.checkpoint_every,
            checkpoint_trainable_only=args.checkpoint_trainable_only,
        ),
    )

    if args.demo and vae_overlay is not None:
        # per-channel latent background = the VAE's own encoding of the
        # scene's white background, in the normalized supervised space.
        # With the scalar parity bg=1.0 the NeRF must fog empty space to
        # paint the true background latent — occupancy never sparsifies
        # and the budgeted eval render collapses (TrainConfig.bg_color).
        import jax
        import jax.numpy as jnp

        from stable_nerf_tpu.models.diffusion.sd_network import (
            encode_images_mode,
        )

        white = jnp.ones((1, 3, args.image_size, args.image_size))
        lt = jax.jit(lambda p, x: encode_images_mode({"vae": p}, x, cfg.sd))(
            vae_overlay, white)
        bg = tuple(float(v)
                   for v in (jnp.mean(lt, axis=(0, 2, 3)) + 1.0) / 2.0)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, bg_color=bg))
        print(f"latent background from VAE(white): "
              f"{[round(b, 3) for b in bg]}")

    print(f"workdir: {workdir}")
    print("loading dataset…")
    dataset = StableNeRFDataset(
        args.dataset,
        shape=args.image_size,
        encoded_shape=args.latent_size,
        percent_objects=args.percent_objects,
        root=args.data_root,
        seed=args.seed,
        scale_intrinsics=args.demo,
    )
    print(f"dataset: {len(dataset)} paired samples")

    pretrained = None
    fingerprint = None
    if args.sdxl_checkpoint:
        from stable_nerf_tpu.models.diffusion.weights import (
            checkpoint_fingerprint, load_sdxl, precheck_sdxl_checkpoint,
        )

        # fast gate: diff the checkpoint's key/shape header against the
        # converter's exact expectations before loading any tensors
        precheck_sdxl_checkpoint(args.sdxl_checkpoint)
        # content identity recorded in FORMAT.json: trainable-only
        # checkpoints rebuild the frozen partition from this file, so a
        # resume/inference with a different file must be refused
        fingerprint = checkpoint_fingerprint(args.sdxl_checkpoint)
        print(f"loading SDXL weights from {args.sdxl_checkpoint} "
              f"(digest {fingerprint['digest'][:12]}…)")
        pretrained = load_sdxl(args.sdxl_checkpoint)
    if vae_overlay is not None:
        # the scene-pretrained tiny VAE replaces the random frozen VAE via
        # the same overlay path real SDXL weights use
        pretrained = {**(pretrained or {}), "vae": vae_overlay}

    if args.inference:
        run_inference(cfg, dataset, workdir,
                      tp=args.tensor_parallel, sp=args.sp,
                      guidance_scale=args.guidance_scale,
                      save_attn_maps=args.save_attn_maps,
                      pretrained=pretrained, fingerprint=fingerprint)
        return
    if args.sp > 1:
        sys.exit("--sp is a serving lever (use with --inference); training "
                 "scale-out is --data-parallel / --tensor-parallel / --fsdp")

    from stable_nerf_tpu.training.loop import train

    train(cfg, dataset, workdir=workdir, seed=args.seed,
          pretrained_sd=pretrained, profile_dir=args.profile_dir,
          data_parallel=args.data_parallel,
          tensor_parallel=args.tensor_parallel, fsdp=args.fsdp,
          resume=args.resume, pretrained_fingerprint=fingerprint)


def run_inference(cfg, dataset, workdir, tp: int = 1, sp: int = 1,
                  guidance_scale: float = 1.0,
                  save_attn_maps: bool = False, pretrained=None,
                  fingerprint=None):
    import dataclasses

    import jax
    import numpy as np

    from stable_nerf_tpu.data.dataset import iterate, split_dataset
    from stable_nerf_tpu.models.diffusion.scheduler import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.sd_network import sd_network_init
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init
    from stable_nerf_tpu.training.checkpoints import CheckpointManager
    from stable_nerf_tpu.training.inference import make_inference_step
    from stable_nerf_tpu.training.joint import (
        joint_trainable_mask, make_optimizer,
    )
    from stable_nerf_tpu.utils.pytree import combine, partition

    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    if ckpt.latest_step() is None:
        sys.exit(f"no checkpoint found under {workdir}/checkpoints")
    fmt = ckpt.read_format()
    t_only = bool(fmt.get("trainable_only"))

    # orbax restores raw dicts/lists without a template — rebuild the exact
    # training-state structure (NamedTuples included) so types round-trip
    if t_only:
        # v2 checkpoints carry only the trainable partition; the frozen
        # SDXL base is rebuilt exactly as the recording run built it, from
        # the (seed, pretrained overlay, frozen_dtype) in FORMAT.json
        if bool(fmt.get("pretrained_sd")) != (pretrained is not None):
            sys.exit(
                f"checkpoint {workdir} was trained "
                f"{'WITH' if fmt.get('pretrained_sd') else 'WITHOUT'} "
                f"--sdxl-checkpoint; pass the matching flag so the frozen "
                f"partition can be reconstructed")
        if "sdxl_fingerprint" in fmt and fmt["sdxl_fingerprint"] != (
                (fingerprint or {}).get("digest")):
            sys.exit(
                f"checkpoint {workdir} was trained against SDXL checkpoint "
                f"digest {fmt['sdxl_fingerprint']} "
                f"(path {fmt.get('sdxl_checkpoint_path')}); this run's "
                f"--sdxl-checkpoint has digest "
                f"{(fingerprint or {}).get('digest')} — the frozen "
                f"partition would be rebuilt from the wrong file")
        from stable_nerf_tpu.training.loop import build_initial_params

        rebuild_cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, frozen_dtype=fmt.get("frozen_dtype"),
                trainable_scope=fmt.get("trainable_scope",
                                        cfg.train.trainable_scope)))
        k_sd, k_nerf, _ = jax.random.split(
            jax.random.PRNGKey(int(fmt.get("seed", 0))), 3)
        params_t = build_initial_params(rebuild_cfg, k_sd, k_nerf,
                                        pretrained)
        from stable_nerf_tpu.training.checkpoints import (
            frozen_partition_checksum, verify_frozen_checksum,
        )
        from stable_nerf_tpu.training.joint import (
            joint_trainable_mask as _jtm,
        )

        verify_frozen_checksum(
            fmt.get("frozen_checksum"),
            frozen_partition_checksum(params_t, _jtm(
                params_t, fmt.get("trainable_scope", "reference"))))
    else:
        k = jax.random.PRNGKey(0)
        k_sd, k_nerf = jax.random.split(k)
        params_t = {"sd": sd_network_init(k_sd, cfg.sd),
                    "nerf": nerf_init(k_nerf, cfg.nerf)}
    # a v2 sidecar records the training run's scope; v1 full-state dirs
    # rely on the caller passing the matching --trainable-scope (the
    # optimizer-state template below must cover the same partition)
    mask_t = joint_trainable_mask(
        params_t, fmt.get("trainable_scope", cfg.train.trainable_scope))
    trainable_t, frozen_t = partition(params_t, mask_t)
    opt_state_t = make_optimizer(cfg.train).init(trainable_t)
    template = {
        "trainable" if t_only else "params": (trainable_t if t_only
                                              else params_t),
        "opt_state": opt_state_t,
        "grid_state": grid_init(cfg.nerf),
        "extra": {"epoch": 0},
    }
    state = ckpt.restore(template=template)
    if t_only:
        params = combine(state["trainable"], frozen_t)
    else:
        params = state["params"]
    grid_state = state["grid_state"]

    scheduler = DDIMScheduler.create(cfg.sd.scheduler)
    # occupancy-driven eval budget from the restored grid (VERDICT r2 #7)
    from stable_nerf_tpu.training.joint import eval_budget_for_occupancy

    occ_frac = float(np.mean(np.asarray(grid_state.occ, dtype=np.float32)))
    budget = eval_budget_for_occupancy(
        occ_frac, 2 * cfg.latent_hw ** 2, cfg.train)
    print(f"eval budget: occ={occ_frac:.4f} → {budget} samples/batch")
    if tp > 1 or sp > 1:
        from stable_nerf_tpu.parallel import make_mesh_3d
        from stable_nerf_tpu.training.inference import (
            make_sharded_inference_step,
        )

        n_needed = tp * sp
        if jax.device_count() < n_needed:
            sys.exit(f"--tensor-parallel {tp} --sp {sp} needs {n_needed} "
                     f"devices, have {jax.device_count()}")
        print(f"serving sharded: seq={sp} model={tp}")
        build = make_sharded_inference_step(
            cfg, scheduler, cfg.train.num_inference_steps,
            mesh=make_mesh_3d(n_needed, sp=sp, tp=tp), tp=tp, sp=sp,
            guidance_scale=guidance_scale, sample_budget=budget)
        params, infer = build(params)
    else:
        infer = jax.jit(make_inference_step(
            cfg, scheduler, cfg.train.num_inference_steps,
            guidance_scale=guidance_scale,
            capture_attn_maps=save_attn_maps, sample_budget=budget))
    _, _, te_idx = split_dataset(len(dataset), seed=cfg.train.seed)

    renders = os.path.join(workdir, "renders")
    os.makedirs(renders, exist_ok=True)
    key = jax.random.PRNGKey(cfg.train.seed)
    total_l2 = 0.0
    for i, batch in enumerate(iterate(dataset, te_idx, 2)):
        key, k = jax.random.split(key)
        out = infer(params, grid_state, batch, k)
        total_l2 += float(out["l2_loss"])
        for j in range(out["denoised_image"].shape[0]):
            psnr_j = float(np.asarray(out["psnr"])[j, 0])
            print(f"image {i}_{j}: PSNR {psnr_j:.2f} "
                  f"SSIM {float(out['ssim']):.3f} L2 {float(out['l2_loss']):.4f}")
            _save_png(os.path.join(renders, f"denoised_{i}_{j}.png"),
                      np.asarray(out["denoised_image"][j]))
            _save_png(os.path.join(renders, f"target_{i}_{j}.png"),
                      np.asarray(out["target_image"][j]))
        if "ip_attn_maps" in out:
            # final-DDIM-step ip-stream attention maps, one file per
            # cross-attn layer (reference attention_processor.py:390-392
            # viz state; saved on demand per VERDICT r2 next #6)
            np.savez(os.path.join(renders, f"ip_attn_maps_{i}.npz"),
                     **{f"layer_{n:03d}": np.asarray(m)
                        for n, m in enumerate(out["ip_attn_maps"])})
    print(f"Average L2 over test set: {total_l2}")


def _save_png(path, img_chw):
    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        np.save(path + ".npy", img_chw)
        return
    arr = (np.clip(img_chw.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


if __name__ == "__main__":
    main()
