"""The joint Stable-NeRF training loop.

Functional equivalent of reference train.py:110-319 (training()): per epoch,
refresh the occupancy grid, run jitted train steps over the train split,
validate, run full DDIM inference every ``inference_every`` epochs, and
checkpoint.  Differences from the reference are upgrades documented in
SURVEY.md §5/§7: periodic orbax checkpoints with optimizer state and
resume, device prefetch, metrics persisted to JSONL, and optional
data-parallel execution over a device mesh.
"""

from __future__ import annotations

import json
import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import StableNeRFDataset, iterate, split_dataset
from ..data.prefetch import device_prefetch
from ..parallel.sharding import (
    make_mesh,
    make_parallel_train_step,
    process_shard_indices,
    replicate,
)
from ..models.diffusion.scheduler import DDIMScheduler
from ..models.diffusion.sd_network import sd_network_init, init_ip_from_unet
from ..models.nerf.grid import grid_init, mark_untrained_grid, update_extra_state
from ..models.nerf.network import nerf_density, nerf_init
from ..training.checkpoints import CheckpointManager
from ..training.inference import make_inference_step
from ..training.joint import (
    JointConfig,
    eval_budget_for_occupancy,
    joint_trainable_mask,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ..utils.profiling import StepTimer
from ..utils.pytree import combine, dealias, partition
from ..utils.visualization import sample_save_for_vis


def _install_sigterm_flag():
    """Install a SIGTERM handler that only sets a flag.

    TPU pods (and most cluster schedulers) deliver SIGTERM ahead of
    eviction; the training loop polls the flag and shuts down cleanly with
    a resumable checkpoint.  Returns ``(flag, uninstall)``; a no-op off the
    main interpreter thread (where ``signal.signal`` would raise).
    """
    flag = {"set": False}

    def handler(signum, frame):
        flag["set"] = True

    try:
        prev = signal.signal(signal.SIGTERM, handler)
    except ValueError:          # not the main interpreter thread
        return flag, lambda: None
    return flag, lambda: signal.signal(signal.SIGTERM, prev)


def train(
    cfg: JointConfig,
    dataset: StableNeRFDataset,
    *,
    workdir: str = "output",
    seed: int = 0,
    epochs: Optional[int] = None,
    pretrained_sd: Optional[Dict] = None,
    log_fn=print,
    data_parallel: bool = False,
    tensor_parallel: int = 1,
    fsdp: bool = False,
    mesh=None,
    resume: bool = False,
    profile_dir: Optional[str] = None,
    pretrained_fingerprint: Optional[Dict] = None,
):
    """Run joint training; returns (params, grid_state, metrics_history).

    ``pretrained_fingerprint`` (weights.checkpoint_fingerprint of the
    --sdxl-checkpoint dir) is recorded in the checkpoint FORMAT.json and
    verified on trainable-only resume, so the frozen partition can never
    silently be rebuilt from a different checkpoint file (ADVICE r3 #1).

    Preemption-safe (beyond the reference, which pickles once at the very
    end, train.py:303-308): SIGTERM sets a flag; the loop stops at the next
    batch boundary, saves a resumable checkpoint, and exits cleanly so
    ``--resume`` continues.  On multi-host every process agrees on the flag
    via a collective before stopping — a lone early exit would deadlock the
    other processes' collectives.

    With ``data_parallel=True`` (or an explicit ``mesh``), the train step is
    shard_map'd over a 1-D ``data`` mesh — params/optimizer/grid replicated,
    batch sharded on its leading axis, gradients pmean'd over ICI (the
    reference's DDP layer, train.py:122-126,185-188, with the NeRF included
    in the grad sync — documented divergence, SURVEY.md §7 delta 4).  Each
    device sees ``cfg.train.batch_size`` samples per step, matching DDP's
    per-worker batch semantics; on multi-host, each process additionally
    iterates only its slice of the train split (DistributedSampler
    equivalent).

    With ``tensor_parallel > 1`` the mesh becomes 2-D (data × model) and the
    U-Net's attention/GEGLU kernels (and their optimizer state) shard over
    the model axis via GSPMD placement (parallel.tp.place_joint_for_gspmd):
    the unmodified train step is jitted on committed shardings and XLA
    inserts the tensor-parallel collectives and the data-axis grad
    all-reduce.  The reference has no model parallelism; this is the
    TPU-native scale-out for when the 2.6B U-Net (plus optimizer state)
    outgrows one chip's HBM.  Requires tensor_parallel ∈ {2, 5, 10} (head
    divisibility) and n_devices % tensor_parallel == 0.

    With ``fsdp=True`` the SD param tree (and its AdamW moments) is
    additionally sharded over the ``data`` axis (ZeRO-3 via GSPMD,
    parallel/fsdp.py) — composable with ``tensor_parallel`` for 2-D
    FSDP × TP.

    With ``resume=True`` the latest checkpoint under ``workdir`` (if any)
    is restored — params, optimizer state, occupancy grid, and epoch —
    and training continues from the recorded epoch (the capability the
    reference lacks entirely: it pickles once at the very end,
    reference train.py:303-308).  Under DP the restore lands on host and
    is replicated below; under TP/FSDP it restores directly into the
    production shardings through an abstract template (each host reads
    only its own shards)."""
    preempt_flag, uninstall = _install_sigterm_flag()
    try:
        return _train_impl(
            cfg, dataset, workdir=workdir, seed=seed, epochs=epochs,
            pretrained_sd=pretrained_sd, log_fn=log_fn,
            data_parallel=data_parallel, tensor_parallel=tensor_parallel,
            fsdp=fsdp, mesh=mesh, resume=resume, profile_dir=profile_dir,
            pretrained_fingerprint=pretrained_fingerprint,
            preempt_flag=preempt_flag)
    finally:
        uninstall()


def build_initial_params(cfg: JointConfig, k_sd, k_nerf,
                         pretrained_sd: Optional[Dict] = None,
                         log_fn=print, log_hbm=lambda stage: None):
    """The joint param tree exactly as a fresh run constructs it: random
    init from (k_sd, k_nerf), optional pretrained-SDXL overlay (with the
    one-time empty-prompt conditioning cache, reference network.py:114-168),
    IP heads initialized from the U-Net's own to_k/to_v (network.py:104-110),
    and the frozen partition storage-cast to ``cfg.train.frozen_dtype``.

    Shared by the training loop and by trainable-only checkpoint restore
    (checkpoints carrying only the trainable partition reconstruct the
    frozen one through this very function, so it must stay byte-deterministic
    in its inputs)."""
    sd_params = sd_network_init(k_sd, cfg.sd)
    if pretrained_sd is not None:
        pretrained_sd = dict(pretrained_sd)
        # The CLIP text towers only exist to cache the empty-prompt SDXL
        # conditioning once at init (reference network.py:114-168); they are
        # consumed here and never enter the jitted train step.
        te1 = pretrained_sd.pop("text_encoder", None)
        te2 = pretrained_sd.pop("text_encoder_2", None)
        sd_params.update(pretrained_sd)
        if te1 is not None and te2 is not None:
            from ..models.diffusion.clip_text import (
                make_empty_prompt_conditioning,
            )

            _, pooled, time_ids = jax.jit(make_empty_prompt_conditioning)(
                te1, te2)
            sd_params["add_text_embeds"] = pooled
            sd_params["add_time_ids"] = time_ids
            log_fn("cached real empty-prompt conditioning "
                   f"(pooled mean {float(pooled.mean()):+.4f})")
    sd_params = init_ip_from_unet(sd_params)
    params = {"sd": sd_params, "nerf": nerf_init(k_nerf, cfg.nerf)}
    del sd_params
    log_hbm("params-init")

    if cfg.train.frozen_dtype is not None:
        # storage-cast the frozen partition (config.TrainConfig.frozen_dtype
        # docstring); applied before optimizer init and before the resume
        # templates so checkpoints round-trip in the storage dtype
        dt = jnp.dtype(cfg.train.frozen_dtype)
        t0, f0 = partition(params, joint_trainable_mask(
            params, cfg.train.trainable_scope))
        # one jitted call with the f32 tree DONATED: an eager per-leaf
        # astype holds the full f32 frozen partition (~9 GB at SDXL scale)
        # alive alongside the growing bf16 copy and OOMs a 16 GB chip;
        # donation lets XLA free each f32 buffer as it is converted, so
        # peak stays ~one tree, not two
        f0 = jax.jit(
            lambda t: jax.tree.map(
                lambda x: (x.astype(dt)
                           if x is not None
                           and jnp.issubdtype(x.dtype, jnp.floating)
                           else x),
                t, is_leaf=lambda x: x is None),
            donate_argnums=0,
        )(f0)
        params = combine(t0, f0)
        del t0, f0
        log_hbm("frozen-cast")
    return params


def _resolve_ckpt_format(ckpt, cfg, seed, has_pretrained, resume, log_fn,
                         fingerprint=None):
    """Decide this run's checkpoint format and validate it against any
    checkpoints already in the directory.

    A directory that already holds checkpoints keeps its format (mixing
    state-dict layouts under one manager would make older steps
    unrestorable).  The frozen partition of a trainable-only checkpoint is
    reconstructed from (seed, --sdxl-checkpoint identity, frozen_dtype) —
    those inputs are recorded in FORMAT.json and must match this run's
    exactly whenever v2 steps exist, whether RESUMING from them (the
    restored trainables would sit on a different frozen model) or WRITING
    more of them (ADVICE r3 #2: a fresh run into a populated directory
    would strand new steps under a stale sidecar): refuse loudly either
    way.  ``fingerprint`` is ``weights.checkpoint_fingerprint`` of the
    pretrained dir (ADVICE r3 #1 — a boolean can't tell two SDXL
    checkpoint files apart); sidecars predating a key skip that key with
    a warning.  On multi-host, process 0's decision is broadcast so hosts
    can never disagree on the format (ADVICE r3 #4: non-shared
    filesystems may hold different sidecars).  Returns
    (trainable_only, fmt_dict)."""
    want = bool(cfg.train.checkpoint_trainable_only)
    on_disk = ckpt.read_format()
    has_steps = ckpt.latest_step() is not None
    t_only = bool(on_disk.get("trainable_only")) if has_steps else want
    if has_steps and t_only != want:
        log_fn(f"checkpoints: directory already holds "
               f"{'trainable-only' if t_only else 'full-state'} checkpoints "
               f"— continuing in that format")
    if t_only and has_steps:
        expect = {"seed": seed, "pretrained_sd": has_pretrained,
                  "frozen_dtype": cfg.train.frozen_dtype,
                  "trainable_scope": cfg.train.trainable_scope,
                  "sdxl_fingerprint": (fingerprint or {}).get("digest")}
        unrecorded = [k for k in expect if k not in on_disk]
        got = {k: on_disk[k] for k in expect if k in on_disk}
        want_rec = {k: expect[k] for k in got}
        if got != want_rec:
            raise ValueError(
                "trainable-only checkpoint directory refused: the frozen "
                "partition is rebuilt from (seed, --sdxl-checkpoint, "
                f"frozen_dtype), but the checkpoint records {got} while "
                f"this run has {want_rec} — "
                + ("the restored trainables would condition a different "
                   "frozen model" if resume else
                   "new steps written here would be unrestorable against "
                   "the recorded inputs (use a fresh --workdir)"))
        if unrecorded:
            log_fn(f"checkpoints: sidecar predates {unrecorded} — those "
                   f"reconstruction inputs cannot be verified for this "
                   f"directory")
    fmt = None
    if t_only:
        fmt = {"version": 2, "trainable_only": True, "seed": seed,
               "pretrained_sd": has_pretrained,
               "frozen_dtype": cfg.train.frozen_dtype,
               "trainable_scope": cfg.train.trainable_scope,
               "sdxl_fingerprint": (fingerprint or {}).get("digest"),
               "sdxl_checkpoint_path": (fingerprint or {}).get("path")}
    if jax.process_count() > 1:
        # one authority: hosts reading FORMAT.json independently can
        # disagree on eventually-consistent filesystems → divergent save
        # trees.  Broadcast process 0's (t_only, fmt) to everyone.
        from jax.experimental import multihost_utils

        payload = json.dumps([t_only, fmt]).encode()
        buf = np.zeros(8192, np.uint8)
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        out = multihost_utils.broadcast_one_to_all(buf)
        t_only, fmt = json.loads(bytes(out.tobytes()).rstrip(b"\x00"))
    return t_only, fmt


def _train_impl(
    cfg: JointConfig,
    dataset: StableNeRFDataset,
    *,
    workdir: str,
    seed: int,
    epochs: Optional[int],
    pretrained_sd: Optional[Dict],
    log_fn,
    data_parallel: bool,
    tensor_parallel: int,
    fsdp: bool,
    mesh,
    resume: bool,
    profile_dir: Optional[str],
    preempt_flag: Dict,
    pretrained_fingerprint: Optional[Dict] = None,
):
    os.makedirs(workdir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    k_sd, k_nerf, key = jax.random.split(key, 3)

    def log_hbm(stage):
        """STABLE_NERF_LOG_HBM=1: print per-device HBM after each setup
        stage — the tool for localizing which allocation OOMs a chip."""
        if os.environ.get("STABLE_NERF_LOG_HBM") != "1":
            return
        from ..utils.profiling import device_memory_stats

        for dev, s in device_memory_stats().items():
            if s.get("bytes_in_use") is not None:
                log_fn(f"hbm[{stage}] {dev}: "
                       f"in_use={s['bytes_in_use']/2**30:.2f} GB "
                       f"peak={(s.get('peak_bytes_in_use') or 0)/2**30:.2f} GB"
                       f" limit={(s.get('bytes_limit') or 0)/2**30:.2f} GB")
        # memory_stats() is None on some backends (the axon tunnel) —
        # jax.live_arrays() works everywhere: every live device buffer the
        # client still references, the tool that localized the round-4
        # resume-path OOM
        arrs = [a for a in jax.live_arrays() if not a.is_deleted()]
        total = sum(a.nbytes for a in arrs)
        log_fn(f"hbm[{stage}] live_arrays: {len(arrs)} arrays "
               f"{total/2**30:.2f} GB")
        for a in sorted(arrs, key=lambda a: -a.nbytes)[:6]:
            log_fn(f"  {str(a.shape):>20} {str(a.dtype):>9} "
                   f"{a.nbytes/2**20:8.1f} MB")

    scheduler = DDIMScheduler.create(cfg.sd.scheduler)
    had_pretrained = pretrained_sd is not None
    params = build_initial_params(cfg, k_sd, k_nerf, pretrained_sd,
                                  log_fn=log_fn, log_hbm=log_hbm)
    del pretrained_sd   # params owns the tree from here on

    grid_state = grid_init(cfg.nerf)
    grid_state = jax.jit(
        lambda s, p: mark_untrained_grid(s, p, dataset.intrinsic, cfg.nerf)
    )(grid_state, jnp.asarray(dataset.all_poses()))

    mask = joint_trainable_mask(params, cfg.train.trainable_scope)
    optimizer = make_optimizer(cfg.train)
    trainable, _ = partition(params, mask)
    opt_state = optimizer.init(trainable)
    del trainable
    log_hbm("opt-init")

    gspmd = tensor_parallel > 1 or fsdp
    if tensor_parallel > 1 and mesh is None:
        from ..parallel.tp import make_mesh_2d

        mesh = make_mesh_2d(tp=tensor_parallel)
    elif (data_parallel or fsdp) and mesh is None:
        mesh = make_mesh()

    def place_for_gspmd(p):
        if fsdp:
            from ..parallel.fsdp import place_joint_for_fsdp

            return place_joint_for_fsdp(
                p, mesh, tp_axis="model" if tensor_parallel > 1 else None)
        from ..parallel.tp import place_joint_for_gspmd

        return place_joint_for_gspmd(p, mesh)

    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    t_only, ckpt_fmt = _resolve_ckpt_format(
        ckpt, cfg, seed, had_pretrained, resume, log_fn,
        fingerprint=pretrained_fingerprint)
    if t_only:
        # ADVICE r3 #3: a cheap sum over the frozen partition travels in
        # FORMAT.json; a resume whose deterministic reconstruction drifts
        # (backend / XLA-version change, wrong overlay) fails here instead
        # of silently training on a different frozen model
        from .checkpoints import (
            frozen_partition_checksum, verify_frozen_checksum,
        )

        fsum = frozen_partition_checksum(params, mask)
        if resume and ckpt.latest_step() is not None:
            verify_frozen_checksum(
                ckpt.read_format().get("frozen_checksum"), fsum,
                log_fn=log_fn)
        ckpt_fmt["frozen_checksum"] = fsum

    def save_ckpt(step_num: int, wait: bool = False):
        """One place for the format switch: v1 saves the full param tree
        under "params"; v2 saves only the trainable partition under
        "trainable" (+ FORMAT.json recording the frozen-reconstruction
        inputs) — at full SDXL that halves the ~9 GB state write."""
        p, pk = params, "params"
        if t_only:
            p, _ = partition(p, mask)
            pk = "trainable"
        t0 = time.perf_counter()
        ckpt.save(step_num, p, opt_state, grid_state,
                  extra={"epoch": step_num}, wait=wait, params_key=pk,
                  fmt=ckpt_fmt if jax.process_index() == 0 else None)
        if wait:
            # synchronous saves can take minutes at full SDXL over a slow
            # D2H path (measured ~8 MB/s on the tunnel) — make it visible
            log_fn(f"checkpoint step {step_num} committed in "
                   f"{time.perf_counter() - t0:.0f}s")

    start_epoch = 0
    placed = False

    def free_superseded(trees, keep=()):
        """Explicitly release device buffers the restored state replaces.
        Rebinding alone is NOT enough: live-array accounting
        (jax.live_arrays) showed the full init trainable+opt tree
        surviving restore behind a gc-opaque holder, which put the
        resumed full-SDXL process ~4.5 GB above the fresh one and OOMed
        its first steps live (round 4).  delete() frees the HBM
        regardless of hidden references, and any later use of a stale
        buffer raises loudly instead of leaking.  ``keep`` protects
        leaves the superseded tree aliases (ip heads share the U-Net's
        to_k/to_v buffers at init — the dealias() concern)."""
        kept = {id(l) for l in jax.tree.leaves(keep)}
        for leaf in jax.tree.leaves(trees):
            if (isinstance(leaf, jax.Array) and id(leaf) not in kept
                    and not leaf.is_deleted()):
                leaf.delete()
        # the id-guard assumes device_put never returns a DISTINCT Array
        # aliasing an init leaf's buffer (zero-copy resharding); fail
        # loudly if that JAX behavior ever changes (ADVICE r4 #1)
        assert not any(
            l.is_deleted() for l in jax.tree.leaves(keep)
            if isinstance(l, jax.Array)), (
            "free_superseded deleted a kept leaf's underlying buffer — "
            "device_put aliasing semantics changed")

    if resume:
        if ckpt.latest_step() is None:
            log_fn(f"WARNING: resume requested but no checkpoint found "
                   f"under {workdir}/checkpoints — starting from scratch")
        elif gspmd:
            # restore straight into the production shardings: build an
            # ABSTRACT ShapeDtypeStruct+sharding template (params via the
            # TP/FSDP placement rules, optimizer moments via the jitted
            # init's propagated output shardings — no device arrays are
            # allocated for the layout probe) and hand it to orbax, so each
            # host reads only its own shards and device memory is touched
            # exactly once, by the restored state itself (multi-host FSDP
            # resume scales; no transient second copy).
            from jax.sharding import NamedSharding, PartitionSpec as P

            if fsdp:
                from ..parallel.fsdp import joint_fsdp_shardings

                shardings = joint_fsdp_shardings(
                    params, mesh,
                    tp_axis="model" if tensor_parallel > 1 else None)
            else:
                from ..parallel.tp import joint_param_shardings

                shardings = joint_param_shardings(params, mesh)
            rep = NamedSharding(mesh, P())
            sds = lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                    sharding=s)
            params_tmpl = jax.tree.map(sds, params, shardings)
            trainable_tmpl, _ = partition(params_tmpl, mask)
            opt_shapes = jax.eval_shape(optimizer.init, trainable_tmpl)
            opt_shardings = jax.jit(optimizer.init).lower(
                trainable_tmpl).compile().output_shardings
            # scalar/aux leaves come out of the init with a single-device
            # default sharding — normalize everything that isn't mesh-placed
            # to mesh-replicated, or the jitted step would see incompatible
            # device sets
            norm = lambda s: s if isinstance(s, NamedSharding) else rep
            opt_tmpl = jax.tree.map(lambda x, s: sds(x, norm(s)),
                                    opt_shapes, opt_shardings)
            grid_tmpl = jax.tree.map(lambda x: sds(x, rep), grid_state)
            tmpl = {"opt_state": opt_tmpl, "grid_state": grid_tmpl,
                    "extra": {"epoch": 0}}
            if t_only:
                tmpl["trainable"] = trainable_tmpl
            else:
                tmpl["params"] = params_tmpl
            state = ckpt.restore(template=tmpl)
            if t_only:
                # frozen partition: reconstructed (build_initial_params,
                # inputs validated against FORMAT.json) and placed into the
                # production shardings; trainables come from the checkpoint
                _, frozen_placed = partition(place_for_gspmd(params), mask)
                # the pre-placement init tree, its eager opt state, and the
                # init grid (all superseded by restored/placed state;
                # ADVICE r4 #2 adds the grid — its jitted
                # mark_untrained_grid buffers survive rebinding too)
                free_superseded((params, opt_state, grid_state),
                                keep=frozen_placed)
                params = combine(state["trainable"], frozen_placed)
            else:
                free_superseded((params, opt_state, grid_state))
                params = state["params"]
            opt_state = state["opt_state"]
            grid_state = state["grid_state"]
            start_epoch = int(state["extra"].get("epoch", 0))
            placed = True
            log_fn(f"resumed from checkpoint step {ckpt.latest_step()} "
                   f"(epoch {start_epoch}, sharded restore over "
                   f"{int(mesh.devices.size)} devices)")
        else:
            # Restore to HOST buffers: StandardRestore follows the
            # template's placement, so a live device-array template makes
            # orbax materialize the whole restored tree ON DEVICE next to
            # the still-live initial state.  At full SDXL that is +4.5 GB
            # of alloc/free churn on a config whose steady state runs at
            # 15.4/15.7 GB — observed live (round 4) to OOM the resumed
            # run's first steps where the fresh run trains fine.  A numpy
            # template keeps the restore entirely host-side; the merged
            # state is committed to device exactly once below.
            # Zero-stride broadcast views carry shape/dtype without
            # allocating the ~9 GB shadow tree np.zeros would reserve
            # (ADVICE r4 #3; verified: orbax StandardRestore reads only
            # shape/dtype from numpy template leaves and returns fresh
            # host ndarrays).  A ShapeDtypeStruct template is NOT
            # equivalent — orbax then restores on device, following the
            # checkpoint's sharding file.
            as_host = lambda x: (np.broadcast_to(
                np.zeros((), x.dtype), x.shape)
                                 if hasattr(x, "shape") else x)
            tmpl = {"opt_state": jax.tree.map(as_host, opt_state),
                    "grid_state": jax.tree.map(as_host, grid_state),
                    "extra": {"epoch": 0}}
            if t_only:
                tmpl["trainable"] = jax.tree.map(
                    as_host, partition(params, mask)[0])
            else:
                tmpl["params"] = jax.tree.map(as_host, params)
            state = ckpt.restore(template=tmpl)
            if t_only:
                t_init, frozen = partition(params, mask)
                free_superseded((t_init, opt_state, grid_state), keep=frozen)
                params = combine(state["trainable"], frozen)
            else:
                free_superseded((params, opt_state, grid_state))
                params = state["params"]
            opt_state = state["opt_state"]
            grid_state = state["grid_state"]
            start_epoch = int(state["extra"].get("epoch", 0))
            # one explicit upload: commit the restored host leaves so the
            # first donated step aliases buffers in place, giving the
            # resumed run the fresh run's exact memory layout.  On a mesh
            # the replicate() below does the placement instead (it expects
            # uncommitted host leaves).
            if mesh is None:
                params, opt_state, grid_state = jax.device_put(
                    (params, opt_state, grid_state))
            log_fn(f"resumed from checkpoint step {ckpt.latest_step()} "
                   f"(epoch {start_epoch}"
                   + (", trainable-only format)" if t_only else ")"))
        log_hbm("restore")

    step_cache = {}

    def step_for_budget(budget, stochastic=False):
        """One traced train step per distinct (sample-budget bucket, encode
        mode) — sample_budget_auto cycles through ≤ log2(max_steps) buckets,
        the stochastic-warmup schedule through two modes."""
        if (budget, stochastic) not in step_cache:
            import dataclasses

            if cfg.train.stochastic_until_epoch:
                # schedule active: the flag decides the encode mode outright
                # (so the exact phase is exact even if cfg.nerf came in
                # stochastic)
                step_cfg = dataclasses.replace(
                    cfg, nerf=dataclasses.replace(
                        cfg.nerf, hash_stochastic=stochastic))
            else:
                step_cfg = cfg
            with_vis = cfg.train.vis_sample_prob > 0
            inner = make_train_step(
                step_cfg, scheduler, optimizer, mask, sample_budget=budget,
                with_vis=with_vis,
                **({"pmean_axis": "data"}
                   if mesh is not None and not gspmd else {}))
            # params/opt_state are donated (in→out aliasing): the loop always
            # continues from the step's returns, and without donation a
            # full-SDXL step holds two copies of ~9 GB of state — OOM on a
            # 16 GB chip (measured, scripts/bench_joint_full_sdxl.py)
            step_cache[(budget, stochastic)] = (
                jax.jit(inner, donate_argnums=(0, 1))
                if mesh is None or gspmd
                else make_parallel_train_step(inner, mesh,
                                              with_vis=with_vis,
                                              donate=True))
        return step_cache[(budget, stochastic)]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.devices.size)
        batch_sharding = NamedSharding(mesh, P("data"))
        if gspmd:
            global_batch = cfg.train.batch_size * (n_dev // tensor_parallel)
            if not placed:     # a sharded resume already restored in place
                params = place_for_gspmd(params)
                trainable, _ = partition(params, mask)
                opt_state = jax.jit(optimizer.init)(trainable)
                grid_state = replicate(grid_state, mesh)
        else:
            global_batch = cfg.train.batch_size * n_dev
            params = replicate(params, mesh)
            opt_state = replicate(opt_state, mesh)
            grid_state = replicate(grid_state, mesh)
    else:
        batch_sharding = None
        global_batch = cfg.train.batch_size
    # On a multi-host mesh each process loads + feeds only its local slice
    # of the global batch; device_prefetch assembles the global array
    # shard-wise (put_sharded).  Single-host: feed == global.
    feed_batch = global_batch
    if mesh is not None and jax.process_count() > 1:
        if global_batch % jax.process_count():
            raise ValueError(
                f"global batch {global_batch} not divisible by "
                f"{jax.process_count()} processes")
        feed_batch = global_batch // jax.process_count()
    cur_budget = cfg.train.sample_budget
    if cur_budget is None and not cfg.train.sample_budget_auto:
        # no flag given: self-size the budget from the HBM envelope so the
        # flagship config compiles without a hand-picked --sample-budget
        # (VERDICT r3 next #3).  Dense stays the default whenever it fits.
        from .joint import derive_train_sample_budget, device_hbm_limit

        limit = device_hbm_limit(jax.local_devices()[0])
        if limit:
            nbytes = lambda t: sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(t)
                if hasattr(x, "dtype"))
            state_bytes = (nbytes(params) + nbytes(opt_state)
                           + nbytes(grid_state))
            cur_budget = derive_train_sample_budget(
                2 * cfg.train.batch_size * cfg.latent_hw ** 2,
                cfg.train.max_steps_train, state_bytes, limit)
            if cur_budget is not None:
                log_fn(f"sample budget: derived {cur_budget} from the HBM "
                       f"envelope (state {state_bytes/2**30:.1f} GB, limit "
                       f"{limit/2**30:.1f} GB) — the dense lattice would "
                       f"not fit; override with --sample-budget")
    # eval/inference steps cached per eval-render budget: the budget is
    # occupancy-driven (pow2-bucketed, VERDICT r2 #7), so these hold at
    # most log2(max_steps_eval) traced functions each
    eval_cache, infer_cache = {}, {}
    epoch_mean_cache = {}   # per-epoch-length jitted metric reductions

    def eval_for_budget(budget):
        if budget not in eval_cache:
            eval_cache[budget] = jax.jit(
                make_eval_step(cfg, scheduler, sample_budget=budget))
        return eval_cache[budget]

    def infer_for_budget(budget):
        if budget not in infer_cache:
            infer_cache[budget] = jax.jit(make_inference_step(
                cfg, scheduler, cfg.train.num_inference_steps,
                sample_budget=budget))
        return infer_cache[budget]

    def density_fn(params):
        return lambda x: (nerf_density(params["nerf"], x, cfg.nerf)["sigma"]
                          * cfg.nerf.density_scale)

    update_fn = jax.jit(
        lambda s, p, k: update_extra_state(s, density_fn(p), k, cfg.nerf)
    )

    tr_idx, va_idx, te_idx = split_dataset(len(dataset), 0.8, 0.1, seed=seed)
    if mesh is not None and jax.process_count() > 1:
        tr_idx = tr_idx[process_shard_indices(len(tr_idx))]
    epochs = epochs if epochs is not None else cfg.train.epochs
    history = []
    timer = StepTimer()
    metrics_path = os.path.join(workdir, "metrics.jsonl")
    # host RNG for the vis-dump sampling (kept off the jax key stream so
    # enabling/disabling dumps never changes training draws)
    import random as _random
    vis_rng = _random.Random(seed + 17)

    # each train step renders 2 views (target+ref) per sample at the
    # encoded resolution (reference train.py:61-66)
    rays_per_step = 2 * cfg.train.batch_size * cfg.latent_hw ** 2

    if start_epoch:
        # decorrelate the resumed key stream from the epochs already run
        # (otherwise epochs start_epoch.. replay epoch 0..'s exact noise /
        # timestep / perturbation draws)
        key = jax.random.fold_in(key, start_epoch)

    preempted = False
    n_proc = jax.process_count()
    t_loop0 = time.perf_counter()   # for per-record wall-clock (the
    # time-to-quality axis the warmup-schedule comparison plots)

    def should_stop():
        """Poll the SIGTERM flag; multi-host processes agree collectively
        (signals land on hosts at different times — a lone early exit would
        hang everyone else's next collective)."""
        if n_proc == 1:
            return preempt_flag["set"]
        from jax.experimental import multihost_utils

        return bool(np.any(multihost_utils.process_allgather(
            np.asarray(preempt_flag["set"]))))

    # the train steps donate params/opt_state; shared buffers between any
    # two leaves (e.g. ip heads initialized from the U-Net's to_k/to_v, or
    # a checkpoint restored with deduplicated arrays) would fail execution
    params, opt_state = dealias(params, opt_state)
    log_hbm("dealias")

    for epoch in range(start_epoch, epochs):
        key, k_grid = jax.random.split(key)
        grid_state = update_fn(grid_state, params, k_grid)
        # one scalar D2H per epoch — drives both the adaptive train budget
        # and the occupancy-driven eval/inference budgets
        occ_frac = float(jnp.mean(grid_state.occ.astype(jnp.float32)))
        if cfg.train.sample_budget_auto:
            from ..ops.compaction import suggest_sample_budget

            cur_budget = suggest_sample_budget(
                occ_frac, rays_per_step, cfg.train.max_steps_train)
        warm = epoch < cfg.train.stochastic_until_epoch
        if cfg.train.stochastic_until_epoch and \
                epoch == cfg.train.stochastic_until_epoch:
            log_fn(f"epoch {epoch}: stochastic warmup over — switching to "
                   f"the exact 8-corner encode")
        step_fn = step_for_budget(cur_budget, warm)

        train_metrics = []
        tracing = False
        t_train0 = time.perf_counter()
        for i, batch in enumerate(device_prefetch(
            iterate(dataset, tr_idx, feed_batch, shuffle=True,
                    seed=seed + epoch),
            sharding=batch_sharding,
        )):
            if should_stop():
                preempted = True
                break
            # profile a few steady-state steps of the first epoch (step 0
            # is the compile; xprof/tensorboard reads the dump)
            if profile_dir and epoch == start_epoch:
                if i == 1:
                    jax.profiler.start_trace(profile_dir)
                    log_fn(f"profiler: tracing steps 1-4 to {profile_dir}")
                    tracing = True
                elif i == 5 and tracing:
                    jax.block_until_ready(params)
                    jax.profiler.stop_trace()
                    tracing = False
            key, k_step = jax.random.split(key)
            out = step_fn(params, opt_state, grid_state, batch, k_step)
            if len(out) == 4:
                params, opt_state, m, vis = out
                # reference train.py:93,102: independent p=0.0125 draw per
                # tensor; host transfer happens only on sampled steps.
                # single writer on shared filesystems.
                if jax.process_index() == 0:
                    for prefix, tensor in vis.items():
                        # under multi-host DP the vis arrays are
                        # batch-sharded globals; save this host's shard
                        # (the reference's per-rank dump, train.py:93)
                        if (hasattr(tensor, "is_fully_addressable")
                                and not tensor.is_fully_addressable):
                            tensor = np.concatenate(
                                [np.asarray(s.data)
                                 for s in tensor.addressable_shards])
                        sample_save_for_vis(
                            prefix, tensor, cfg.train.vis_sample_prob,
                            directory=os.path.join(workdir,
                                                   "visualizations"),
                            rng=vis_rng)
            else:
                params, opt_state, m = out
            train_metrics.append(m)
        # drain the async dispatch queue before reading the clock: steps are
        # dispatched without blocking (good — keeps the device pipeline
        # full), so per-step host timing would measure enqueue, not compute
        # (the round-3 demo logged 220k "rays/s" where the true device rate
        # was 15.5k).  Epoch wall over a barrier is the honest number.
        if train_metrics:
            jax.block_until_ready(train_metrics[-1])
        train_wall = time.perf_counter() - t_train0
        timer.observe(
            steps=len(train_metrics),
            rays=2 * global_batch * cfg.latent_hw ** 2 * len(train_metrics),
            seconds=train_wall)
        if tracing:          # epoch shorter than the trace window
            jax.block_until_ready(params)
            jax.profiler.stop_trace()

        if preempted:
            # save mid-epoch state as a resumable checkpoint (the epoch is
            # incomplete, so it re-runs on --resume) unless one at least
            # this fresh already exists (orbax refuses duplicate steps).
            # latest_step() can report a step whose ASYNC save is still
            # streaming (the periodic epoch save below runs wait=False) —
            # exiting on that basis alone corrupts it mid-write, so both
            # arms drain the manager before the process goes down
            # (observed live: round-3 demo, ROUND3_NOTES §10).
            latest = ckpt.latest_step()
            if latest is None or latest < epoch:
                save_ckpt(epoch, wait=True)
                log_fn(f"preempted (SIGTERM): resumable checkpoint saved; "
                       f"epoch {epoch} re-runs on --resume")
            else:
                ckpt.wait_until_finished()
                log_fn(f"preempted (SIGTERM): checkpoint step {latest} "
                       f"committed; exiting cleanly")
            break

        # Val/inference run replicated on every host (va_idx/te_idx are the
        # same everywhere): on multi-host, host-local numpy can't be jitted
        # together with globally-placed params, so batches are placed as
        # mesh-replicated global arrays (every process passes identical rows).
        def global_batch_put(batch):
            if mesh is None or jax.process_count() == 1:
                return batch
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import put_sharded

            rep = NamedSharding(mesh, P())
            return {k: put_sharded(v, rep) for k, v in batch.items()}

        # eval renders 2B views (target+ref concat, forward_iteration)
        val_metrics = []
        if cfg.train.val_every > 0 and (
                epoch % cfg.train.val_every == 0 or epoch == epochs - 1):
            val_budget = eval_budget_for_occupancy(
                occ_frac, 2 * cfg.train.batch_size * cfg.latent_hw ** 2,
                cfg.train)
            eval_fn = eval_for_budget(val_budget)
            for batch in iterate(dataset, va_idx, cfg.train.batch_size):
                key, k_step = jax.random.split(key)
                val_metrics.append(eval_fn(params, grid_state,
                                           global_batch_put(batch), k_step))

        # one jitted reduction + one host pull per metric set instead of
        # len(ms)×len(keys) scalar D2H round trips (19 ms each over the
        # axon tunnel — ~0.4 s/epoch at demo scale, measured r5)
        def epoch_means(ms):
            if not ms:
                return {}
            n = len(ms)
            if n not in epoch_mean_cache:
                epoch_mean_cache[n] = jax.jit(
                    lambda ms: {k: jnp.mean(jnp.stack([m[k] for m in ms]))
                                for k in ms[0]})
            return {k: float(v)
                    for k, v in jax.device_get(
                        epoch_mean_cache[n](ms)).items()}

        # per-epoch (steady-state) rate from THIS epoch's barrier-timed
        # wall — the honest throughput (VERDICT r4 weak #4: the lifetime
        # cumulative average is dominated by compile epochs for tens of
        # epochs; the resume demo printed 1435→4513 "rays/s" climbing
        # toward a ~19.8k steady state).  The cumulative stays in the
        # record as rays_per_sec_cum for time-to-quality accounting.
        epoch_rays = 2 * global_batch * cfg.latent_hw ** 2 * len(train_metrics)
        tr_mean = epoch_means(train_metrics)
        va_mean = epoch_means(val_metrics)
        nan = float("nan")
        record = {
            "epoch": epoch,
            "train_loss": tr_mean.get("loss", nan),
            "train_sd_loss": tr_mean.get("sd_loss", nan),
            "train_nerf_loss": tr_mean.get("nerf_loss", nan),
            "val_loss": va_mean.get("loss", nan),
            "val_sd_loss": va_mean.get("sd_loss", nan),
            "val_nerf_loss": va_mean.get("nerf_loss", nan),
            "rays_per_sec": (epoch_rays / train_wall if train_wall > 0
                             else float("nan")),
            "rays_per_sec_cum": timer.rays_per_sec(),
            "steps_per_sec": (len(train_metrics) / train_wall
                              if train_wall > 0 else float("nan")),
            "train_wall_s": round(train_wall, 1),
            "elapsed_s": round(time.perf_counter() - t_loop0, 1),
        }
        history.append(record)
        if jax.process_index() == 0:   # one writer on a shared filesystem
            with open(metrics_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        log_fn(f"epoch {epoch}: train {record['train_loss']:.4f} "
               f"val {record['val_loss']:.4f} "
               f"({record['rays_per_sec']:.0f} rays/s)")

        if (cfg.train.inference_every > 0
                and (epoch + 1) % cfg.train.inference_every == 0
                and len(te_idx) > 0):
            # inference renders only the 2 target views per batch
            infer_fn = infer_for_budget(eval_budget_for_occupancy(
                occ_frac, 2 * cfg.latent_hw ** 2, cfg.train))
            inf_metrics = []
            for i, batch in enumerate(iterate(dataset, te_idx, 2)):
                key, k_step = jax.random.split(key)
                out = infer_fn(params, grid_state, global_batch_put(batch),
                               k_step)
                inf_metrics.append({
                    "psnr": float(np.mean(np.asarray(out["psnr"]))),
                    "latent_psnr": float(np.mean(
                        np.asarray(out["latent_psnr"]))),
                    "ssim": float(out["ssim"]),
                    "l2_loss": float(out["l2_loss"]),
                })
                log_fn(f"  inference[{i}]: psnr={inf_metrics[-1]['psnr']:.2f} "
                       f"latent_psnr={inf_metrics[-1]['latent_psnr']:.2f} "
                       f"ssim={inf_metrics[-1]['ssim']:.3f} "
                       f"l2={inf_metrics[-1]['l2_loss']:.4f}")
            # persist the interleaved-inference metrics (the reference only
            # prints them, train.py:413-416) — this is the across-checkpoint
            # learning record VERDICT r2 next #4 asks for
            if inf_metrics and jax.process_index() == 0:
                inf_record = {"epoch": epoch, "kind": "inference"}
                for k in inf_metrics[0]:
                    inf_record[f"inference_{k}"] = float(
                        np.mean([m[k] for m in inf_metrics]))
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(inf_record) + "\n")

        if (cfg.train.checkpoint_every > 0
                and (epoch + 1) % cfg.train.checkpoint_every == 0):
            save_ckpt(epoch + 1)

    if epochs > start_epoch and not preempted:
        # skip when no epoch ran: a resume with nothing left to do must not
        # rewrite (or, with epochs < the recorded epoch, mislabel) the
        # checkpoint it just restored
        save_ckpt(epochs, wait=True)
    # drain any still-streaming periodic save before returning control
    # toward interpreter exit (same hazard as the preempt branch)
    ckpt.wait_until_finished()
    return params, grid_state, history
