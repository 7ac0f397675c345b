"""Fully-sharded data parallelism (parallel/fsdp.py).

The reference replicates the whole SDXL + AdamW state on every DDP worker
(reference train.py:122-126,185); these tests cover the TPU-native ZeRO-3
extension — GSPMD shardings over the ``data`` axis, composable with tensor
parallelism — verified against the single-device step on the 8-virtual-
device CPU mesh.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stable_nerf_tpu.models.diffusion import DDIMScheduler
from stable_nerf_tpu.models.diffusion.sd_network import sd_network_init
from stable_nerf_tpu.models.nerf import grid_init, nerf_init
from stable_nerf_tpu.parallel import make_mesh, shard_batch
from stable_nerf_tpu.parallel.fsdp import (
    joint_fsdp_specs, place_joint_for_fsdp,
)
from stable_nerf_tpu.parallel.tp import make_mesh_2d
from stable_nerf_tpu.training.joint import (
    joint_trainable_mask, make_optimizer, make_train_step,
)
from stable_nerf_tpu.utils.pytree import partition

from test_joint_training import make_batch, tiny_joint_cfg


def _setup(key=jax.random.PRNGKey(3)):
    cfg = tiny_joint_cfg()
    k1, k2 = jax.random.split(key)
    params = {"sd": sd_network_init(k1, cfg.sd),
              "nerf": nerf_init(k2, cfg.nerf)}
    grid_state = grid_init(cfg.nerf)
    grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
    return cfg, params, grid_state, DDIMScheduler.create(cfg.sd.scheduler)


def _n_sharded(specs):
    return sum(any(e is not None for e in s)
               for s in jax.tree.leaves(
                   specs, is_leaf=lambda x: isinstance(x, P)))


def test_fsdp_specs_shard_sd_only():
    """Large SD leaves get a ``data`` dim; the NeRF stays replicated; leaves
    below min_size stay replicated."""
    _, params, _, _ = _setup()
    mesh = make_mesh(8)
    specs = joint_fsdp_specs(params, mesh, min_size=1 << 8)

    assert all(s == P() for s in jax.tree.leaves(
        specs["nerf"], is_leaf=lambda x: isinstance(x, P)))
    assert _n_sharded(specs["sd"]) > 0
    # every sharded dim is actually divisible by the axis size
    def check(leaf, spec):
        for d, e in zip(leaf.shape, list(spec) + [None] * leaf.ndim):
            if e is not None:
                assert d % 8 == 0, (leaf.shape, spec)
        return None
    jax.tree.map(check, params["sd"], specs["sd"],
                 is_leaf=lambda x: isinstance(x, P))
    # tiny leaves (e.g. norm scales) replicated
    small = [s for leaf, s in zip(jax.tree.leaves(params["sd"]),
                                  jax.tree.leaves(
                                      specs["sd"],
                                      is_leaf=lambda x: isinstance(x, P)))
             if leaf.size < (1 << 8)]
    assert small and all(s == P() for s in small)


def test_fsdp_specs_compose_with_tp():
    """With tp_axis, TP's model-dim shardings survive and FSDP claims a
    different dim."""
    _, params, _, _ = _setup()
    mesh = make_mesh_2d(8, tp=2)
    specs = joint_fsdp_specs(params, mesh, tp_axis="model", min_size=1 << 8)
    blk = specs["sd"]["unet"]["mid_block"]["attentions"][0]["blocks"][0]
    qspec = blk["attn1"]["to_q"]["kernel"]
    assert "model" in qspec and "data" in qspec
    assert qspec.index("model") != qspec.index("data")


@pytest.mark.slow
def test_fsdp_train_step_matches_single_device():
    """Full joint train step jitted with ZeRO-3 placement over a 1-D
    data mesh: same function, same global batch/key as single-device —
    params and loss must match up to reduction order, and the AdamW
    moments must come back sharded."""
    cfg, params, grid_state, scheduler = _setup()
    key = jax.random.PRNGKey(5)
    mask = joint_trainable_mask(params)
    opt = make_optimizer(cfg.train)
    trainable, _ = partition(params, mask)
    batch = make_batch(key, 8)

    step = jax.jit(make_train_step(cfg, scheduler, opt, mask))
    p1, o1, m1 = step(params, opt.init(trainable), grid_state, batch, key)

    mesh = make_mesh(8)
    params_p = place_joint_for_fsdp(params, mesh, min_size=1 << 8)
    trainable_p, _ = partition(params_p, mask)
    opt_p = jax.jit(opt.init)(trainable_p)
    grid_p = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), grid_state)
    batch_p = shard_batch(batch, mesh, axis="data")
    p2, o2, m2 = step(params_p, opt_p, grid_p, batch_p, key)

    # placement put params on the data axis…
    placed_specs = [x.sharding.spec for x in jax.tree.leaves(params_p["sd"])
                    if not x.sharding.is_fully_replicated]
    assert placed_specs and all(
        "data" in [e for e in s if e is not None] for s in placed_specs)
    # …and the step's outputs stay sharded (jit outputs carry GSPMD
    # shardings without a .spec, so test replication instead)
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(p2["sd"]))
    # optimizer moments inherit the sharding (ZeRO-1 for free)
    assert any(hasattr(x, "sharding")
               and not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(o2))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-4)
    # same step-size-bounded comparison as the TP GSPMD test: a ~0 grad can
    # flip sign under the sharded reduction order (Adam step ≈ lr·sign(g))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=2.5e-4),
        p2, p1)


@pytest.mark.slow
def test_fsdp_tp_2d_train_step():
    """FSDP × TP on a (data=4 × model=2) mesh: one step runs, loss matches
    the single-device step, and a U-Net kernel is sharded on both axes."""
    cfg, params, grid_state, scheduler = _setup()
    key = jax.random.PRNGKey(7)
    mask = joint_trainable_mask(params)
    opt = make_optimizer(cfg.train)
    trainable, _ = partition(params, mask)
    batch = make_batch(key, 4)

    step = jax.jit(make_train_step(cfg, scheduler, opt, mask))
    p1, o1, m1 = step(params, opt.init(trainable), grid_state, batch, key)

    mesh = make_mesh_2d(8, tp=2)
    params_p = place_joint_for_fsdp(params, mesh, tp_axis="model",
                                    min_size=1 << 8)
    trainable_p, _ = partition(params_p, mask)
    opt_p = jax.jit(opt.init)(trainable_p)
    grid_p = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), grid_state)
    batch_p = shard_batch(batch, mesh, axis="data")
    p2, o2, m2 = step(params_p, opt_p, grid_p, batch_p, key)

    qk_in = params_p["sd"]["unet"]["mid_block"]["attentions"][0]["blocks"][
        0]["attn1"]["to_q"]["kernel"]
    assert ("model" in qk_in.sharding.spec
            and "data" in qk_in.sharding.spec)
    qk_out = p2["sd"]["unet"]["mid_block"]["attentions"][0]["blocks"][0][
        "attn1"]["to_q"]["kernel"]
    assert not qk_out.sharding.is_fully_replicated
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-4)
