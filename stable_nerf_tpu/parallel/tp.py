"""Tensor parallelism for the SDXL U-Net over a `model` mesh axis.

The reference has no model parallelism (its SDXL fits one GPU and HF
Accelerate only data-parallelizes, reference train.py:122-126).  On TPU the
natural scale-out beyond data parallelism is megatron-style tensor
parallelism over the ICI ring: every transformer block's attention heads and
GEGLU hidden dim are column-sharded, the output projections row-sharded, and
one `psum` per projection reassembles the activations.  Convs, norms, time
embeddings, and the (tiny) conditioning path stay replicated — at SDXL
shapes they are bandwidth-bound and sharding them would trade one broadcast
for many halo exchanges.

Two consumption styles, both driven by the same spec tree:

  * **Explicit collectives (shard_map)** — `unet_apply(..., tp_axis="model")`
    under `jax.shard_map` with `unet_tp_specs(params)` in_specs.  Kernels
    must be pre-permuted by `permute_unet_for_tp` so the GEGLU val/gate
    halves are contiguous per shard.  Deterministic, serving-oriented.
  * **GSPMD (jit + NamedSharding)** — place params with
    `unet_tp_shardings(params, mesh)` and `jit` the unmodified model
    (`tp_axis=None`); XLA's partitioner inserts the same collectives.  No
    permutation needed (XLA reshards the GEGLU split).  Training-oriented:
    optimizer-state shardings propagate automatically.

Head divisibility: the tensor axis size must divide every attention width /
head_dim — SDXL's 10/20 heads admit tp ∈ {2, 5, 10}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param dicts column-sharded on the output dim (bias, if any, sharded too)
_COL = {"to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "ff_geglu"}
# param dicts row-sharded on the input dim (bias replicated, added post-psum)
_ROW = {"to_out", "ff_out"}


def make_mesh_2d(n_devices: int = -1, tp: int = 1,
                 axes=("data", "model")) -> Mesh:
    """(data × model) mesh; the model axis is innermost so its psums ride
    adjacent-chip ICI links."""
    devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    return Mesh(np.asarray(devices).reshape(n // tp, tp), axes)


def _map_tp_tree(params: Any, leaf_fn, name: str | None = None) -> Any:
    """Mirror the U-Net param tree, calling leaf_fn(kind, key, leaf) with
    kind ∈ {"col", "row", "rep"} for every array leaf."""
    if isinstance(params, dict):
        if name in _COL:
            return {k: leaf_fn("col", k, v) for k, v in params.items()}
        if name in _ROW:
            return {k: leaf_fn("row", k, v) for k, v in params.items()}
        return {k: _map_tp_tree(v, leaf_fn, k) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(_map_tp_tree(v, leaf_fn, name) for v in params)
    return leaf_fn("rep", name, params)


def unet_tp_specs(params: Dict, axis: str = "model") -> Dict:
    """PartitionSpec tree matching a U-Net param tree (shard_map in_specs /
    NamedSharding placement)."""
    def leaf(kind, key, v):
        if kind == "col":
            return P(None, axis) if key == "kernel" else P(axis)
        if kind == "row":
            return P(axis, None) if key == "kernel" else P()
        return P()
    return _map_tp_tree(params, leaf)


def unet_tp_shardings(params: Dict, mesh: Mesh, axis: str = "model") -> Dict:
    specs = unet_tp_specs(params, axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def _geglu_col_perm(hidden: int, tp: int) -> np.ndarray:
    """Column permutation making each contiguous 1/tp slice of the GEGLU
    kernel hold [val_i | gate_i]: shard-local `jnp.split(z, 2)` then matches
    the unsharded semantics (diffusers GEGLU: val = first half, gate =
    second half of the 8c projection)."""
    half = hidden // 2
    if half % tp:
        raise ValueError(f"GEGLU half width {half} not divisible by tp={tp}")
    m = half // tp
    order = []
    for i in range(tp):
        order.extend(range(i * m, (i + 1) * m))             # val block i
        order.extend(range(half + i * m, half + (i + 1) * m))  # gate block i
    return np.asarray(order)


def permute_unet_for_tp(params: Dict, tp: int, inverse: bool = False) -> Dict:
    """Permute every ff_geglu kernel/bias for contiguous tp sharding (no-op
    on all other leaves; `inverse=True` restores checkpoint layout).

    Attention q/k/v need no permutation: contiguous column blocks are
    contiguous head groups, and `to_out`/`ff_out` rows already partition in
    the same contiguous block order as their producers' columns."""
    def leaf(kind, key, v):
        return v

    def rec(node, name=None):
        if isinstance(node, dict):
            if name == "ff_geglu":
                perm = _geglu_col_perm(node["kernel"].shape[1], tp)
                if inverse:
                    perm = np.argsort(perm)
                out = {"kernel": node["kernel"][:, perm]}
                if "bias" in node:
                    out["bias"] = node["bias"][perm]
                return out
            return {k: rec(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, name) for v in node)
        return node

    return rec(params)


def shard_unet_for_tp(params: Dict, mesh: Mesh, axis: str = "model"):
    """Permute + place a U-Net param tree for the explicit-collectives
    (shard_map) path.  Returns (sharded_params, spec_tree)."""
    tp = mesh.shape[axis]
    permuted = permute_unet_for_tp(params, tp)
    shardings = unet_tp_shardings(permuted, mesh, axis)
    placed = jax.tree.map(jax.device_put, permuted, shardings)
    return placed, unet_tp_specs(permuted, axis)


def joint_param_shardings(params: Dict, mesh: Mesh,
                          axis: str = "model") -> Dict:
    """NamedSharding tree for the joint ``{"sd", "nerf"}`` param tree:
    U-Net attention/GEGLU kernels sharded over the model axis, everything
    else (VAE, image-proj, NeRF, conditioning caches) replicated."""
    rep = NamedSharding(mesh, P())
    out = jax.tree.map(lambda _: rep, params)
    if "sd" in params and "unet" in params["sd"]:
        out["sd"]["unet"] = unet_tp_shardings(params["sd"]["unet"], mesh,
                                              axis)
    return out


def place_joint_for_gspmd(params: Dict, mesh: Mesh,
                          axis: str = "model") -> Dict:
    """Place the joint param tree for the GSPMD 2-D (data × model) training
    path: `jit` the unmodified train step (no `tp_axis`, no pmean) on
    arrays committed with these shardings and XLA's partitioner inserts the
    tensor-parallel collectives and the data-parallel grad all-reduce
    itself — the "annotate shardings, let XLA insert collectives" recipe.
    No GEGLU permutation is needed (XLA reshards the split).  Optimizer
    state: init it under jit from the placed params so its shardings
    propagate (``jax.jit(opt.init)(trainable)``)."""
    return jax.tree.map(jax.device_put, params,
                        joint_param_shardings(params, mesh, axis))


def make_tp_unet_apply(params: Dict, mesh: Mesh, cfg,
                       axis: str = "model", data_axis: str | None = None,
                       compute_dtype=jnp.float32):
    """shard_map-wrapped tensor-parallel `unet_apply` for serving.

    Returns (sharded_params, apply_fn) with
    ``apply_fn(sharded_params, sample, t, ehs, text_embeds, time_ids)``.
    Activations are replicated over `axis`; when ``data_axis`` is given the
    batch additionally shards over it (2-D dp × tp inference).
    """
    from ..models.diffusion.unet import unet_apply

    placed, specs = shard_unet_for_tp(params, mesh, axis)
    act = P(data_axis) if data_axis else P()

    def local_apply(p, sample, t, ehs, text_embeds, time_ids):
        return unet_apply(p, sample, t, ehs,
                          added_text_embeds=text_embeds,
                          added_time_ids=time_ids, cfg=cfg,
                          compute_dtype=compute_dtype, tp_axis=axis)

    mapped = jax.shard_map(
        local_apply, mesh=mesh,
        in_specs=(specs, act, act, act, act, act),
        out_specs=act,
    )
    return placed, jax.jit(mapped)
