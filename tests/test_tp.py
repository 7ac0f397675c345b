"""Tensor parallelism for the SDXL U-Net (parallel/tp.py).

The reference has no model parallelism (SURVEY.md §2.3: DP only via
Accelerate, train.py:122-126); these tests cover the TPU-native extension:
megatron-style sharded attention/GEGLU with explicit psum under shard_map,
verified bit-level (up to f32 summation order) against the single-shard
model on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stable_nerf_tpu.models.diffusion.unet import (
    tiny_unet_config, unet_apply, unet_init,
)
from stable_nerf_tpu.parallel.tp import (
    _geglu_col_perm, make_mesh_2d, make_tp_unet_apply, permute_unet_for_tp,
    shard_unet_for_tp, unet_tp_specs,
)


def _inputs(cfg, B=2, H=8, key=jax.random.PRNGKey(7)):
    ks = jax.random.split(key, 4)
    return dict(
        sample=jax.random.normal(ks[0], (B, cfg.in_channels, H, H)),
        t=jnp.linspace(10.0, 900.0, B),
        ehs=jax.random.normal(ks[1], (B, 4, cfg.cross_attention_dim)),
        text_embeds=jax.random.normal(ks[2], (B, cfg.pooled_projection_dim)),
        time_ids=jnp.broadcast_to(
            jnp.asarray([[8.0, 8.0, 0.0, 0.0, 8.0, 8.0]]), (B, 6)),
    )


def _reference_eps(params, cfg, inp):
    return unet_apply(params, inp["sample"], inp["t"], inp["ehs"],
                      added_text_embeds=inp["text_embeds"],
                      added_time_ids=inp["time_ids"], cfg=cfg)


def test_geglu_perm_roundtrip():
    perm = _geglu_col_perm(16, 4)
    assert sorted(perm.tolist()) == list(range(16))
    inv = np.argsort(perm)
    assert (perm[inv] == np.arange(16)).all()


def test_permute_unet_roundtrip():
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    p2 = permute_unet_for_tp(params, 4)
    p3 = permute_unet_for_tp(p2, 4, inverse=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, p3)
    # the permutation must actually move columns on geglu kernels
    blk = params["mid_block"]["attentions"][0]["blocks"][0]
    blk2 = p2["mid_block"]["attentions"][0]["blocks"][0]
    assert not np.array_equal(blk["ff_geglu"]["kernel"],
                              blk2["ff_geglu"]["kernel"])


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_forward_parity(tp):
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    inp = _inputs(cfg)
    want = _reference_eps(params, cfg, inp)

    mesh = make_mesh_2d(tp, tp=tp)
    placed, apply_fn = make_tp_unet_apply(params, mesh, cfg)
    got = apply_fn(placed, inp["sample"], inp["t"], inp["ehs"],
                   inp["text_embeds"], inp["time_ids"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_dp_2d_forward_parity():
    """dp=2 × tp=2: batch sharded over data, kernels over model."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(1), cfg)
    inp = _inputs(cfg, B=4)
    want = _reference_eps(params, cfg, inp)

    mesh = make_mesh_2d(4, tp=2)
    placed, apply_fn = make_tp_unet_apply(params, mesh, cfg,
                                          data_axis="data")
    got = apply_fn(placed, inp["sample"], inp["t"], inp["ehs"],
                   inp["text_embeds"], inp["time_ids"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_specs_structure():
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    specs = unet_tp_specs(params, "model")
    # matching tree structure
    assert (jax.tree.structure(params, is_leaf=lambda x: False)
            == jax.tree.structure(
                specs, is_leaf=lambda x: isinstance(x, P)))
    blk = specs["mid_block"]["attentions"][0]["blocks"][0]
    assert blk["attn1"]["to_q"]["kernel"] == P(None, "model")
    assert blk["attn1"]["to_out"]["kernel"] == P("model", None)
    assert blk["attn1"]["to_out"]["bias"] == P()
    assert blk["ff_geglu"]["bias"] == P("model")
    assert blk["attn2"]["to_k_ip"]["kernel"] == P(None, "model")
    assert specs["conv_in"]["kernel"] == P()


@pytest.mark.slow
def test_gspmd_2d_train_step_matches_single_device():
    """Full joint train step jitted over a (data=4 × model=2) mesh via
    GSPMD placement (place_joint_for_gspmd): same function, same global
    batch and key as the single-device step — params/metrics must match up
    to f32 reduction order."""
    from test_joint_training import make_batch, tiny_joint_cfg

    from stable_nerf_tpu.models.diffusion import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.sd_network import sd_network_init
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init
    from stable_nerf_tpu.parallel import place_joint_for_gspmd, shard_batch
    from stable_nerf_tpu.training.joint import (
        joint_trainable_mask, make_optimizer, make_train_step,
    )
    from stable_nerf_tpu.utils.pytree import partition

    key = jax.random.PRNGKey(3)
    cfg = tiny_joint_cfg()
    k1, k2 = jax.random.split(key)
    params = {"sd": sd_network_init(k1, cfg.sd), "nerf": nerf_init(k2, cfg.nerf)}
    grid_state = grid_init(cfg.nerf)
    grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
    scheduler = DDIMScheduler.create(cfg.sd.scheduler)
    mask = joint_trainable_mask(params)
    opt = make_optimizer(cfg.train)
    trainable, _ = partition(params, mask)
    batch = make_batch(key, 4)

    step = jax.jit(make_train_step(cfg, scheduler, opt, mask))

    # single device
    p1, o1, m1 = step(params, opt.init(trainable), grid_state, batch, key)

    # 2-D GSPMD: commit shardings, jit the SAME step
    mesh = make_mesh_2d(8, tp=2)
    params_p = place_joint_for_gspmd(params, mesh)
    trainable_p, _ = partition(params_p, mask)
    opt_p = jax.jit(opt.init)(trainable_p)
    grid_p = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), grid_state)
    batch_p = shard_batch(batch, mesh, axis="data")
    p2, o2, m2 = step(params_p, opt_p, grid_p, batch_p, key)

    # sharded-leaf sanity: the unet q kernel really lives on the model axis
    qk = p2["sd"]["unet"]["mid_block"]["attentions"][0]["blocks"][0][
        "attn1"]["to_q"]["kernel"]
    assert qk.sharding.spec == P(None, "model")

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    # first Adam step ≈ lr·sign(g): a grad that is numerically ~0 can flip
    # sign under the sharded reduction order, moving a param by up to 2·lr
    # (lr=1e-4 in tiny cfg) — bound the comparison by the step size
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=2.5e-4),
        p2, p1)


@pytest.mark.slow
def test_tp_grad_parity():
    """Grads through the shard_map TP forward match the single-shard model —
    the property a tensor-parallel *training* step rests on.  Sharded-leaf
    grads come back sharded; jit reassembles them into global arrays."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(2), cfg)
    inp = _inputs(cfg)

    def ref_loss(p):
        return jnp.mean(_reference_eps(p, cfg, inp) ** 2)

    want = jax.grad(ref_loss)(params)

    tp = 2
    mesh = make_mesh_2d(tp, tp=tp)
    permuted = permute_unet_for_tp(params, tp)
    specs = unet_tp_specs(permuted)

    def local_loss(p):
        eps = unet_apply(p, inp["sample"], inp["t"], inp["ehs"],
                         added_text_embeds=inp["text_embeds"],
                         added_time_ids=inp["time_ids"], cfg=cfg,
                         tp_axis="model")
        return jnp.mean(eps ** 2)

    mapped = jax.shard_map(lambda p: jax.grad(local_loss)(p), mesh=mesh,
                           in_specs=(specs,), out_specs=specs)
    got_perm = jax.jit(mapped)(
        jax.tree.map(jax.device_put, permuted,
                     jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))))
    got = permute_unet_for_tp(jax.tree.map(np.asarray, got_perm), tp,
                              inverse=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5),
        got, want)
