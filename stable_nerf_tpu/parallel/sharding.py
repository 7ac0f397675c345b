"""Data-parallel scale-out over a jax.sharding Mesh.

TPU-native replacement for the reference's HF-Accelerate/DDP layer
(reference train.py:122-126,185-188,202,221; SURVEY.md §2.3): a 1-D
``data`` mesh, params replicated, batch sharded on the leading axis, and a
`shard_map`-wrapped train step whose gradient `pmean` rides ICI.  Unlike the
reference — which exempts the NeRF from DDP gradient sync via its unwrap
quirk (train.py:187-188) — the NeRF's gradients ARE averaged here
(documented divergence, SURVEY.md §7 delta 4).

Multi-host: each process feeds its local shard (jax.process_index-based
dataset sharding); the same code path covers single-chip, v4-8, and pods
since XLA lowers the collectives per topology.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (-1 = all)."""
    devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def process_shard_indices(n_samples: int) -> np.ndarray:
    """This host's slice of the dataset for multi-host training.

    The reference's accelerate launcher shards batches via DistributedSampler;
    the JAX-native equivalent: each process loads only its contiguous slice
    (SURVEY.md §5 "host data sharding per process").

    Every process gets EXACTLY ``n_samples // n`` indices — the remainder is
    dropped, never assigned to the last process: unequal slices would let
    hosts disagree on the number of full batches per epoch, and the first
    collective of the extra batch would deadlock the job (same reason
    torch's DistributedSampler equalizes ranks).
    """
    p = jax.process_index()
    n = jax.process_count()
    per = n_samples // n
    start = p * per
    return np.arange(start, start + per)


def barrier(name: str = "sync"):
    """Cross-host barrier (the reference's accelerator.wait_for_everyone(),
    train.py:312)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_sharded(value, sharding: jax.sharding.Sharding) -> jax.Array:
    """Device-put a host array under a (possibly multi-host) sharding.

    Single-process: plain ``device_put``.  Multi-process: ``device_put``
    cannot target non-addressable devices, so ``value`` must be this
    process's LOCAL slice of the global array (the disjoint per-host slice
    produced by ``process_shard_indices``-based loading) and the global
    array is assembled shard-wise with no cross-host transfer
    (``jax.make_array_from_process_local_data``) — the JAX-native analogue
    of the reference's per-rank DistributedSampler batches
    (reference train.py:170-172 under the accelerate launcher).
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(value))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Shard a host batch on its leading (batch) axis across the mesh.

    Multi-host: each process passes its local slice of the global batch
    (see ``put_sharded``)."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: put_sharded(v, sharding) for k, v in batch.items()}


def make_parallel_train_step(step_fn, mesh: Mesh, axis: str = "data",
                             with_vis: bool = False, donate: bool = False):
    """Wrap a per-shard train step into an SPMD step via shard_map.

    ``step_fn(params, opt_state, grid_state, batch, key)`` must already
    pmean its grads/metrics over ``axis`` (build it with
    ``make_train_step(..., pmean_axis=axis)``).

    Batch enters sharded on the leading axis; params/opt_state/grid_state
    are replicated and stay replicated (the pmean makes updates identical
    on every device).  The per-device PRNG key is folded with the device
    index so noise/timesteps differ across shards like independent torch
    workers.
    """
    # check_vma/check_rep must be OFF: with the vma type system on,
    # jax.grad inside the shard_map auto-inserts a psum for the cotangent of
    # the replicated params (transpose of the implicit broadcast), so the
    # step's explicit lax.pmean would then be a no-op on already-replicated
    # grads and the update would apply the SUM of per-device grads
    # (effective lr x n_devices).  With the check off, grads stay per-device
    # and the documented "step_fn must pmean" contract holds.  Regression:
    # tests/test_joint_training.py::test_parallel_grads_are_averaged_not_summed.
    try:
        from jax import shard_map as _shard_map

        def shard_map(f, **kw):
            return _shard_map(f, check_vma=False, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map

        def shard_map(f, **kw):
            return _shard_map(f, check_rep=False, **kw)

    def device_step(params, opt_state, grid_state, batch, key):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)
        return step_fn(params, opt_state, grid_state, batch, key)

    batch_spec = P(axis)
    rep = P()
    # vis tensors (make_train_step(with_vis=True) 4th output) are per-shard
    # batch outputs — they come back batch-sharded like the input
    out_specs = (rep, rep, rep, batch_spec) if with_vis else (rep, rep, rep)
    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, batch_spec, rep),
        out_specs=out_specs,
    )
    # donate=True aliases params/opt_state in→out (halves their HBM
    # footprint — at full SDXL scale the un-donated step cannot fit one
    # chip).  Callers must then always continue from the returned trees.
    return jax.jit(mapped, donate_argnums=(0, 1) if donate else ())
