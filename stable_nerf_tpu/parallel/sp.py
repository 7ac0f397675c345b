"""Sequence (context) parallelism for the SDXL U-Net — ring attention.

The reference has no sequence parallelism (SURVEY §2.3: its only scale-out is
HF-Accelerate data parallelism, reference train.py:122-126); every GPU holds
the full token sequence and the full O(S²) attention.  On TPU the sequence
axis is the natural third mesh dimension next to data and model: each device
keeps only S/n latent tokens of every transformer interior, self-attention
rotates k/v blocks one hop per step around the ICI ring
(`models.diffusion.nn.ring_sdpa`, flash-style online softmax), and
cross-attention needs no collective at all because its k/v come from the
replicated conditioning tokens.  Per-token work (proj_in/out, layer norms,
GEGLU) shards for free; one tiled all_gather per transformer reassembles the
spatial map for the convolutions.

Worth it when the token count is large — SDXL at 1024² images has 128²
latents = 16 384 tokens where attention logits are 16 384² per head — while
at the joint-training workload (64² latents) the convs dominate and DP/TP
are the better axes.  Composes with tensor parallelism on a 3-D
(data × seq × model) mesh: heads split over `model`, tokens over `seq`,
batch over `data`.

Consumption style: explicit collectives under `shard_map` (serving path,
like `tp.make_tp_unet_apply`).  ``check_vma=False`` on the wrapper: the
mid-network all_gathers make every downstream value "varying but equal"
over the seq axis, which shard_map's replication-inference cannot prove.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.diffusion.nn import ring_sdpa  # re-export: the SP primitive
from .tp import shard_unet_for_tp

__all__ = ["make_mesh_3d", "make_sp_unet_apply", "ring_sdpa",
           "serving_param_specs"]


def make_mesh_3d(n_devices: int = -1, sp: int = 1, tp: int = 1,
                 axes=("data", "seq", "model")) -> Mesh:
    """(data × seq × model) mesh; model innermost so TP psums ride adjacent
    ICI links, seq next so the k/v ring stays within one straight segment."""
    devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    n = len(devices)
    if n % (sp * tp):
        raise ValueError(f"{n} devices not divisible by sp*tp={sp * tp}")
    return Mesh(np.asarray(devices).reshape(n // (sp * tp), sp, tp), axes)


def serving_param_specs(params: Dict, tp: int = 1,
                        tp_axis: str = "model",
                        unet_keys=("unet",)):
    """Prepare a param tree for shard_map serving: permute the U-Net's
    GEGLU kernels for contiguous tp sharding and build the matching
    PartitionSpec tree (U-Net attention/GEGLU per `tp.unet_tp_specs`,
    everything else replicated).  ``unet_keys`` locates the U-Net subtree
    (("unet",) for a bare SD tree, ("sd", "unet") for the joint tree).
    Returns (params, pspecs); with tp == 1 params are returned unpermuted
    and every spec is P().  Shared by run_sd.py, train.py --inference and
    training/inference.py so the permute/spec recipe lives in one place."""
    from .tp import permute_unet_for_tp, unet_tp_specs

    pspecs = jax.tree.map(lambda _: P(), params)
    if tp > 1:
        sub = params
        for k in unet_keys[:-1]:
            sub = sub[k]
        unet = permute_unet_for_tp(sub[unet_keys[-1]], tp)
        # rebuild the nested dicts along the path without mutating input
        def set_path(tree, keys, value):
            if not keys:
                return value
            out = dict(tree)
            out[keys[0]] = set_path(tree[keys[0]], keys[1:], value)
            return out
        params = set_path(params, list(unet_keys), unet)
        pspecs = set_path(pspecs, list(unet_keys),
                          unet_tp_specs(unet, tp_axis))
    return params, pspecs


def make_sp_unet_apply(params: Dict, mesh: Mesh, cfg,
                       seq_axis: str = "seq",
                       tp_axis: Optional[str] = None,
                       data_axis: Optional[str] = None,
                       compute_dtype=jnp.float32):
    """Sequence-parallel (optionally × tensor-parallel) serving `unet_apply`.

    Returns ``(placed_params, apply_fn)`` with
    ``apply_fn(placed_params, sample, t, ehs, text_embeds, time_ids)``.

    Params: replicated over ``seq_axis``; column/row-sharded over
    ``tp_axis`` when given (GEGLU kernels permuted, see `tp`).  Activations:
    replicated over seq/model (each transformer slices its own token block
    internally); batch shards over ``data_axis`` when given.

    Every latent token count the U-Net visits (h·w at each resolution) must
    be divisible by the seq axis size — `unet_apply` raises at trace time
    otherwise.
    """
    from ..models.diffusion.unet import unet_apply

    if tp_axis is not None:
        placed, specs = shard_unet_for_tp(params, mesh, tp_axis)
    else:
        rep = jax.sharding.NamedSharding(mesh, P())
        placed = jax.tree.map(lambda x: jax.device_put(x, rep), params)
        specs = jax.tree.map(lambda _: P(), params)
    act = P(data_axis) if data_axis else P()

    def local_apply(p, sample, t, ehs, text_embeds, time_ids):
        return unet_apply(p, sample, t, ehs,
                          added_text_embeds=text_embeds,
                          added_time_ids=time_ids, cfg=cfg,
                          compute_dtype=compute_dtype,
                          tp_axis=tp_axis, sp_axis=seq_axis)

    mapped = jax.shard_map(
        local_apply, mesh=mesh,
        in_specs=(specs, act, act, act, act, act),
        out_specs=act,
        check_vma=False,
    )
    return placed, jax.jit(mapped)
