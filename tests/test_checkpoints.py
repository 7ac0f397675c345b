"""Orbax checkpoint save/restore roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.models.nerf import grid_init, nerf_init
from stable_nerf_tpu.training.checkpoints import CheckpointManager


def test_save_restore_roundtrip(tmp_path, key):
    cfg = NeRFConfig(grid_size=16,
                     encoding_sigma=HashGridConfig(n_levels=2,
                                                   log2_hashmap_size=8,
                                                   base_resolution=4))
    params = {"nerf": nerf_init(key, cfg)}
    grid_state = grid_init(cfg)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, params, opt_state, grid_state, extra={"epoch": 1}, wait=True)
    mgr.save(5, params, opt_state, grid_state, extra={"epoch": 5}, wait=True)
    assert mgr.latest_step() == 5

    template = {"params": params, "opt_state": opt_state,
                "grid_state": grid_state, "extra": {"epoch": 0}}
    restored = mgr.restore(template=template)
    assert restored["extra"]["epoch"] == 5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grid state tuple roundtrips
    np.testing.assert_array_equal(np.asarray(grid_state.density_grid),
                                  np.asarray(restored["grid_state"].density_grid
                                             if hasattr(restored["grid_state"], "density_grid")
                                             else restored["grid_state"][0]))
    mgr.close()


def test_sharded_save_single_device_restore(tmp_path, key):
    """Checkpoint portability across sharding modes: params saved while
    sharded over the 8-device mesh (the TP/FSDP training states) must
    restore into a single-device template bit-identically — the
    train-sharded → infer-anywhere path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    w = jax.device_put(jax.random.normal(key, (16, 8)),
                       NamedSharding(mesh, P("data", None)))
    b = jax.device_put(jax.random.normal(key, (8,)),
                       NamedSharding(mesh, P()))
    params = {"w": w, "b": b}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, params, None, None, extra={"epoch": 1}, wait=True)

    template = {"params": {"w": jnp.zeros((16, 8)), "b": jnp.zeros((8,))},
                "opt_state": None, "grid_state": None,
                "extra": {"epoch": 0}}
    restored = mgr.restore(template=template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(w))
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]),
                                  np.asarray(b))
    mgr.close()


def test_max_to_keep_evicts(tmp_path, key):
    cfg = NeRFConfig(grid_size=16,
                     encoding_sigma=HashGridConfig(n_levels=2,
                                                   log2_hashmap_size=8,
                                                   base_resolution=4))
    params = {"nerf": nerf_init(key, cfg)}
    grid_state = grid_init(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, params, None, grid_state, wait=True)
    steps = mgr.manager.all_steps()
    assert 1 not in steps and set(steps) == {2, 3}
    mgr.close()
