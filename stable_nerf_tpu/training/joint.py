"""Joint Stable-NeRF training: the reference's forward_iteration as one
jitted step.

Reproduces reference train.py:23-107 exactly:
  1. frozen-VAE encode of (target, reference) images (no grad);
  2. latent GT normalize to [0, 1];
  3. NeRF render of target+reference rays at the latent resolution;
  4. nerf_loss = L1(pred_target, gt_target) + L1(pred_ref, gt_ref);
  5. condition assembly [pred_target·2−1 | target_dirs] and
     [ref_vae_latent | ref_dirs] → [2B, 7, 64, 64];
  6. random timesteps + DDIM add_noise on the target latent;
  7. frozen U-Net + IP-Adapter noise prediction;
  8. sd_loss = MSE(noise_pred, noise).

Design deltas (documented divergences, SURVEY.md §7):
  * NeRF gradients participate in the data-parallel psum — the reference
    accidentally exempts NeRF from DDP (train.py:187-188);
  * gradients are taken only w.r.t. the trainable partition so XLA elides
    the frozen-U-Net weight-gradient matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import NeRFConfig, TrainConfig
from ..models.diffusion.scheduler import DDIMScheduler
from ..models.diffusion.sd_network import (
    SDNetworkConfig,
    encode_images,
    encode_images_mode,
    sd_forward,
    trainable_mask as sd_trainable_mask,
)
from ..models.nerf.grid import OccupancyGridState
from ..models.nerf.renderer import render
from ..utils.losses import l1_loss, mse_loss
from ..utils.pytree import combine, partition


@dataclass(frozen=True)
class JointConfig:
    nerf: NeRFConfig = field(default_factory=lambda: NeRFConfig(channel_dim=4))
    sd: SDNetworkConfig = field(default_factory=SDNetworkConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    @property
    def latent_hw(self) -> int:
        return self.sd.sd.latent_size


def eval_sample_budget(n_rays: int, cfg: TrainConfig) -> Optional[int]:
    """Static eval-render sample budget: explicit override, else 64/ray
    (the measured-safe default replacing the reference's alive-ray loop
    economics, renderer.py:119-167); None → dense lattice eval."""
    if cfg.sample_budget_eval is not None:
        return cfg.sample_budget_eval
    if cfg.sample_budget_eval_per_ray <= 0:
        return None
    return min(n_rays * cfg.sample_budget_eval_per_ray,
               n_rays * cfg.max_steps_eval)


def eval_budget_for_occupancy(occ_fraction: Optional[float], n_rays: int,
                              cfg: TrainConfig) -> Optional[int]:
    """Occupancy-driven eval budget (VERDICT r2 next #7).

    The eval render's cost is linear in the sample budget (ARCHITECTURE.md
    eval ablation: encode is 207 of 249 ms at 2^18), and a trained scene
    occupies a few percent of the grid — so size the budget from the
    measured occupied fraction (pow2-bucketed like the train policy,
    ops.compaction.suggest_sample_budget) instead of the static 64/ray.
    The static budget stays as the CAP: it is the measured-safe ceiling,
    and an occupancy estimate can only shrink it.  Falls back to the
    static budget when auto is off, an explicit override is set, or no
    occupancy measurement is available.
    """
    static = eval_sample_budget(n_rays, cfg)
    if (occ_fraction is None or not cfg.sample_budget_eval_auto
            or cfg.sample_budget_eval is not None):
        return static
    from ..ops.compaction import suggest_sample_budget

    budget = suggest_sample_budget(occ_fraction, n_rays, cfg.max_steps_eval)
    if budget is None:          # estimate reached the dense lattice
        return static
    return budget if static is None else min(budget, static)


# HBM per chip by device_kind (public spec sheets) × 0.98 usable — the
# fallback when memory_stats() is unavailable (None over the remote axon
# tunnel, where the flagship config most needs the self-sized budget)
DEVICE_HBM_BYTES = {
    "TPU v5 lite": int(16 * 2 ** 30 * 0.98),
    "TPU v5e": int(16 * 2 ** 30 * 0.98),
    "TPU v5": int(95 * 2 ** 30 * 0.98),
    "TPU v5p": int(95 * 2 ** 30 * 0.98),
    "TPU v4": int(32 * 2 ** 30 * 0.98),
    "TPU v6 lite": int(32 * 2 ** 30 * 0.98),
    "TPU v6e": int(32 * 2 ** 30 * 0.98),
}


def device_hbm_limit(device) -> Optional[int]:
    """Usable HBM bytes of ``device``: the allocator's own bytes_limit when
    it reports one, else the spec-sheet fallback for known TPU kinds, else
    None (CPU/unknown — callers leave the budget dense)."""
    stats = device.memory_stats() or {}
    return stats.get("bytes_limit") or DEVICE_HBM_BYTES.get(
        getattr(device, "device_kind", ""))


def derive_train_sample_budget(
    n_rays: int,
    max_steps: int,
    state_bytes: int,
    hbm_limit_bytes: int,
    *,
    bytes_per_sample: int = 2048,
    fixed_temp_frac: float = 0.65,
    reserve_bytes: int = 2 ** 28,
    min_budget: int = 2 ** 16,
) -> Optional[int]:
    """HBM-envelope default for the TRAIN-side sample budget (VERDICT r3
    next #3): size the NeRF march's compaction budget so the whole step
    fits the chip, instead of requiring the operator to remember
    ``--sample-budget 262144`` (without it, plain full-SDXL
    ``train.py --frozen-bf16`` dies in an XLA compile OOM at 19.1 GB —
    dense 8192×256 lattice temps on top of 9 GB of donated state,
    ROUND3_NOTES §10 bug 2).  The reference's analogue is the
    self-adapting mean_count pool (raymarching.py:198-203).

    Model (calibrated on the v5e full-SDXL measurements,
    scripts/bench_joint_full_sdxl.py):

        step HBM ≈ state + fixed_temps + bytes_per_sample × budget

    where ``state`` = params + optimizer + grid + batch (donated
    arguments: 9.0 GB at flagship), ``fixed_temps`` = the budget-
    independent U-Net/VAE fwd+bwd activations ≈ 0.65 × state (5.83 of
    9.0 GB measured), and the marginal NeRF cost is ~2 KiB/sample (march
    + 16-level hash features + MLP activations, fwd+bwd: (10.1 − 6.36)
    GB / (2 097 152 − 262 144) samples).  Returns None (dense lattice —
    exact, preferred) when dense fits; otherwise the largest power of two
    that fits, floored at ``min_budget``.  At the flagship config on a
    16 GB chip this derives exactly the measured-good 262 144.

    Fog-phase caveat (renderer.render's sample_budget note): a budget
    that binds before the occupancy grid sparsifies truncates rays
    mid-flight; the learning demo showed full-SDXL training from scratch
    converging fine at this derived budget (train 1.91→0.74 over 50
    epochs), but callers should prefer dense whenever it fits — which
    this function does.
    """
    dense = n_rays * max_steps
    fixed = fixed_temp_frac * state_bytes
    avail = hbm_limit_bytes - state_bytes - fixed - reserve_bytes
    if avail >= dense * bytes_per_sample:
        return None
    max_samples = max(avail / bytes_per_sample, 1.0)
    budget = max(min_budget, 1 << int(np.floor(np.log2(max_samples))))
    return None if budget >= dense else budget


def joint_trainable_mask(params: Dict, scope: str = "reference") -> Dict:
    """Mask over {'sd': …, 'nerf': …}.

    ``scope`` selects the optimized subset:
      * ``"reference"`` (default): the reference's optimizer set
        (train.py:179-182) = sd ip-head (image_proj + downsampling +
        to_k_ip/to_v_ip) + whole NeRF — everything else is frozen
        pretrained weight;
      * ``"sd"``: additionally train the whole U-Net (base weights
        included).  The VAE and the cached prompt conditioning
        (add_text_embeds/add_time_ids — buffers, not weights) stay
        frozen.  This is the learned-diffusion demo mode: with no real
        pretrained SDXL available (zero-egress), a tiny U-Net trained
        from scratch through the joint sd_loss is the only way the
        conditioning → DDIM sampling → decode path can ever operate in a
        learned regime (VERDICT r4 next #1).
    """
    if scope == "reference":
        sd_mask = sd_trainable_mask(params["sd"])
    elif scope == "sd":
        sd_mask = {
            k: jax.tree.map(
                lambda _: k not in ("vae", "add_text_embeds", "add_time_ids"),
                v)
            for k, v in params["sd"].items()
        }
    else:
        raise ValueError(
            f"unknown trainable scope {scope!r} (reference | sd)")
    return {
        "sd": sd_mask,
        "nerf": jax.tree.map(lambda _: True, params["nerf"]),
    }


def forward_iteration(
    params: Dict,
    grid_state: OccupancyGridState,
    batch: Dict,
    key,
    cfg: JointConfig,
    scheduler: DDIMScheduler,
    *,
    train: bool = True,
    compute_dtype=jnp.bfloat16,
    sample_budget: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """One joint forward pass → (sd_loss, nerf_loss, aux)."""
    enc = cfg.latent_hw
    C = cfg.nerf.channel_dim
    k_vae, k_noise, k_t, k_perturb = jax.random.split(key, 4)

    target_image = batch["target_image"]
    reference_image = batch["reference_image"]
    B = target_image.shape[0]

    # 1. frozen VAE encode, batched then split (train.py:44), no grad.
    # cfg.train.vae_encode selects sample (reference parity) vs mode
    # (deterministic — required when the VAE's posterior is not tight,
    # see TrainConfig.vae_encode)
    images = jnp.concatenate([target_image, reference_image], axis=0)
    if cfg.train.vae_encode == "mode":
        latents = jax.lax.stop_gradient(
            encode_images_mode(params["sd"], images, cfg.sd))
    else:
        latents = jax.lax.stop_gradient(
            encode_images(params["sd"], images, k_vae, cfg.sd)
        )
    target_lt, reference_lt = jnp.split(latents, 2, axis=0)   # [B, 4, 64, 64]

    # 2. latent GT → [B, 4096, 4] in [0, 1] (train.py:52-53)
    def to_gt(lt):
        return (lt.transpose(0, 2, 3, 1).reshape(B, -1, C) + 1.0) / 2.0

    target_gt, reference_gt = to_gt(target_lt), to_gt(reference_lt)

    # 3. NeRF render, target and reference batched (train.py:61-66)
    rays_o = jnp.concatenate([batch["target_rays_o"], batch["reference_rays_o"]], 0)
    rays_d = jnp.concatenate([batch["target_rays_d"], batch["reference_rays_d"]], 0)
    if not train and sample_budget is None:
        sample_budget = eval_sample_budget(
            rays_o.shape[0] * rays_o.shape[1], cfg.train)
    out = render(
        params["nerf"], grid_state, rays_o, rays_d, cfg.nerf,
        bg_color=cfg.train.bg_color,
        max_steps=cfg.train.max_steps_train if train else cfg.train.max_steps_eval,
        perturb_key=k_perturb if train else None,
        compute_dtype=compute_dtype,
        sample_budget=sample_budget,
    )
    pred_target, pred_reference = jnp.split(out["image"], 2, axis=0)

    # 4. reconstruction loss (train.py:70)
    nerf_loss = l1_loss(pred_target, target_gt) + l1_loss(pred_reference,
                                                          reference_gt)

    # 5. conditions (train.py:75-82): NeRF target latent renormalized ×2−1;
    #    reference condition uses the VAE latent, not the NeRF render
    pred_target_lt = (
        pred_target.reshape(B, enc, enc, C).transpose(0, 3, 1, 2) * 2.0 - 1.0
    )
    t_dirs = batch["target_rays_d"].transpose(0, 2, 1).reshape(B, 3, enc, enc)
    r_dirs = batch["reference_rays_d"].transpose(0, 2, 1).reshape(B, 3, enc, enc)
    image_embeds = jnp.concatenate([
        jnp.concatenate([pred_target_lt, t_dirs], axis=1),
        jnp.concatenate([reference_lt, r_dirs], axis=1),
    ], axis=0)                                                # [2B, 7, 64, 64]

    # 6. noise + timesteps + add_noise (train.py:85-91)
    noise = jax.random.normal(k_noise, target_lt.shape)
    timesteps = jax.random.randint(
        k_t, (B,), 0, scheduler.config.num_train_timesteps
    )
    noisy_latents = scheduler.add_noise(target_lt, noise, timesteps)

    # 7-8. U-Net prediction + diffusion loss (train.py:100-105)
    noise_pred = sd_forward(params["sd"], noisy_latents, timesteps,
                            image_embeds, cfg.sd, compute_dtype=compute_dtype)
    sd_loss = mse_loss(noise_pred.astype(jnp.float32), noise)

    aux = {
        "pred_target_latent": pred_target,
        "weights_sum": out["weights_sum"],
        # vis-dump tensors (reference train.py:93,102 saves these at
        # p=0.0125 via sample_save_for_vis; the loop persists them)
        "noisy_latents": noisy_latents,
        "noise_pred": noise_pred,
    }
    return sd_loss, nerf_loss, aux


def make_train_step(
    cfg: JointConfig,
    scheduler: DDIMScheduler,
    optimizer: optax.GradientTransformation,
    mask: Dict,
    *,
    sample_budget: Optional[int] = None,
    pmean_axis: Optional[str] = None,
    with_vis: bool = False,
):
    """Build the jitted joint train step.

    Differentiates only the mask-selected partition.  When ``pmean_axis`` is
    set (inside shard_map), gradients and metrics are psum-averaged across
    the data axis — including the NeRF (divergence note in module docstring).

    ``with_vis``: additionally return {"latents", "pred"} (the reference's
    sample_save_for_vis tensors, train.py:93,102) as a 4th output — device
    arrays, so they cost a host transfer only on the steps the loop
    actually samples for saving.
    """

    def step(params, opt_state, grid_state, batch, key):
        trainable, frozen = partition(params, mask)

        def loss_fn(trainable):
            p = combine(trainable, frozen)
            sd_loss, nerf_loss, aux = forward_iteration(
                p, grid_state, batch, key, cfg, scheduler,
                train=True, sample_budget=sample_budget,
            )
            return sd_loss + nerf_loss, (sd_loss, nerf_loss, aux)

        (total, (sd_loss, nerf_loss, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)

        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            total = jax.lax.pmean(total, pmean_axis)
            sd_loss = jax.lax.pmean(sd_loss, pmean_axis)
            nerf_loss = jax.lax.pmean(nerf_loss, pmean_axis)

        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = combine(trainable, frozen)
        metrics = {"loss": total, "sd_loss": sd_loss, "nerf_loss": nerf_loss}
        if with_vis:
            vis = {"latents": aux["noisy_latents"], "pred": aux["noise_pred"]}
            return params, opt_state, metrics, vis
        return params, opt_state, metrics

    return step


def make_eval_step(cfg: JointConfig, scheduler: DDIMScheduler,
                   sample_budget: Optional[int] = None):
    """Validation forward (reference train.py:229-243, no grad).

    ``sample_budget``: explicit eval render budget (e.g. the
    occupancy-driven one from :func:`eval_budget_for_occupancy`); None →
    the static eval default inside forward_iteration."""

    def step(params, grid_state, batch, key):
        sd_loss, nerf_loss, _ = forward_iteration(
            params, grid_state, batch, key, cfg, scheduler, train=False,
            sample_budget=sample_budget,
        )
        return {"loss": sd_loss + nerf_loss, "sd_loss": sd_loss,
                "nerf_loss": nerf_loss}

    return step


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW(lr, wd) as the reference configures it (train.py:177-183),
    with optional gradient accumulation (the reference's
    accelerator.accumulate surface, train.py:202) via optax.MultiSteps.

    ``cfg.lr_schedule`` selects an optional decay (default "constant" =
    exact reference parity); exponential decay measured +3 dB over
    constant lr on the NeRF fit harness (FIT_LOG.md).

    ``cfg.nerf_lr`` (optional, beyond the reference's single AdamW): a
    separate learning rate for the NeRF subtree via
    ``optax.multi_transform`` — instant-ngp hash grids train at ~1e-2
    while diffusion weights want ~1e-3/1e-4; one shared lr starves one
    side or destabilizes the other (the learned-diffusion demo's
    motivation).  None = single optimizer, exact parity."""

    def schedule(base_lr):
        if cfg.lr_schedule == "constant":
            return base_lr
        if cfg.lr_schedule == "exponential":
            return optax.exponential_decay(base_lr, cfg.lr_decay_steps,
                                           cfg.lr_decay_factor)
        if cfg.lr_schedule == "cosine":
            return optax.cosine_decay_schedule(base_lr, cfg.lr_decay_steps,
                                               alpha=cfg.lr_decay_factor)
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r} "
            "(constant | exponential | cosine)")

    def adamw(base_lr):
        return optax.adamw(
            learning_rate=schedule(base_lr), b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        )

    if cfg.nerf_lr is None:
        opt = adamw(cfg.lr)
    else:
        opt = optax.multi_transform(
            {"sd": adamw(cfg.lr), "nerf": adamw(cfg.nerf_lr)},
            param_labels=lambda params: {
                k: jax.tree.map(lambda _: "nerf" if k == "nerf" else "sd", v)
                for k, v in params.items()
            },
        )
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt
