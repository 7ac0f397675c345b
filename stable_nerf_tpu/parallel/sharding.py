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
    """
    p = jax.process_index()
    n = jax.process_count()
    per = n_samples // n
    start = p * per
    end = start + per if p < n - 1 else n_samples
    return np.arange(start, end)


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


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Shard a host batch on its leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_parallel_train_step(step_fn, mesh: Mesh, axis: str = "data"):
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
    try:
        from jax import shard_map as _shard_map

        def shard_map(f, **kw):
            return _shard_map(f, **kw)
    except ImportError:  # older jax: needs check_rep=False for pmean'd outs
        from jax.experimental.shard_map import shard_map as _shard_map

        def shard_map(f, **kw):
            return _shard_map(f, check_rep=False, **kw)

    def device_step(params, opt_state, grid_state, batch, key):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)
        return step_fn(params, opt_state, grid_state, batch, key)

    batch_spec = P(axis)
    rep = P()
    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, batch_spec, rep),
        out_specs=(rep, rep, rep),
    )
    return jax.jit(mapped)
