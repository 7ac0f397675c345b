"""Sequence parallelism: ring attention + sequence-sharded U-Net interiors
(parallel/sp.py, models/diffusion/nn.py::ring_sdpa).

The reference has no sequence parallelism (SURVEY.md §2.3 row "Sequence/
context parallelism: NO" — its only scale-out is Accelerate DP,
train.py:122-126); these tests cover the TPU-native extension on the
8-virtual-device CPU mesh: the ring_sdpa online-softmax primitive against
plain sdpa, the full U-Net with every transformer interior token-sharded,
and the 3-D data × seq × model composition with tensor parallelism.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from stable_nerf_tpu.models.diffusion.nn import ring_sdpa, sdpa
from stable_nerf_tpu.models.diffusion.unet import (
    tiny_unet_config, unet_apply, unet_init,
)
from stable_nerf_tpu.parallel.sp import make_mesh_3d, make_sp_unet_apply


def _seq_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _qkv(B=2, H=4, S=64, D=16, key=jax.random.PRNGKey(11)):
    return tuple(jax.random.normal(jax.random.fold_in(key, i), (B, H, S, D))
                 for i in range(3))


def _ring_fn(mesh):
    spec = P(None, None, "seq", None)
    return jax.jit(jax.shard_map(partial(ring_sdpa, axis="seq"), mesh=mesh,
                                 in_specs=(spec,) * 3, out_specs=spec))


@pytest.mark.parametrize("n", [1, 2, 8])
def test_ring_sdpa_forward_parity(n):
    """Exact softmax attention regardless of ring size (n=1 is the sdpa
    fallback branch)."""
    q, k, v = _qkv()
    want = sdpa(q, k, v)
    got = _ring_fn(_seq_mesh(n))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ring_sdpa_grad_parity():
    q, k, v = _qkv()
    f = _ring_fn(_seq_mesh(8))

    def loss_ring(q, k, v):
        return jnp.sum(f(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_ring_sdpa_bf16():
    """bf16 operands follow sdpa's dtype rules (bf16 MXU matmuls, f32
    accumulation) and return bf16."""
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv())
    got = _ring_fn(_seq_mesh(4))(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.0, atol=2e-2)


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


def _reference_eps(params, cfg, inp, **kw):
    return unet_apply(params, inp["sample"], inp["t"], inp["ehs"],
                      added_text_embeds=inp["text_embeds"],
                      added_time_ids=inp["time_ids"], cfg=cfg, **kw)


@pytest.mark.parametrize("sp", [2, 8])
def test_sp_unet_forward_parity(sp):
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    inp = _inputs(cfg)
    want = _reference_eps(params, cfg, inp)

    mesh = make_mesh_3d(sp, sp=sp)
    placed, apply_fn = make_sp_unet_apply(params, mesh, cfg)
    got = apply_fn(placed, inp["sample"], inp["t"], inp["ehs"],
                   inp["text_embeds"], inp["time_ids"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sp_unet_grad_parity():
    """Grads through the sequence-parallel forward match the single-shard
    model — ring_sdpa's VJP (scan of ppermutes) must transpose correctly.

    The grad is taken OUTSIDE the shard_map (differentiate-through), which
    is the supported composition for the SP path: with ``check_vma=False``
    (required by the mid-network all_gathers, see parallel/sp.py) shard_map
    does NOT auto-psum cotangents of replicated inputs, so an inner
    ``jax.grad`` would return per-device partial grads."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(2), cfg)
    inp = _inputs(cfg)

    def ref_loss(p):
        return jnp.mean(_reference_eps(p, cfg, inp) ** 2)

    want = jax.grad(ref_loss)(params)

    mesh = make_mesh_3d(8, sp=8)
    placed, apply_fn = make_sp_unet_apply(params, mesh, cfg)

    def sp_loss(p):
        eps = apply_fn(p, inp["sample"], inp["t"], inp["ehs"],
                       inp["text_embeds"], inp["time_ids"])
        return jnp.mean(eps ** 2)

    got = jax.grad(sp_loss)(placed)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5),
        got, want)


@pytest.mark.slow
def test_sp_remat_grad_parity():
    """Block remat composed with sequence parallelism: the checkpointed
    transformer must recompute through the ring (ppermute scan) in the
    backward without changing values or grads."""
    import dataclasses

    cfg = dataclasses.replace(tiny_unet_config(), remat=True)
    params = unet_init(jax.random.PRNGKey(5), cfg)
    inp = _inputs(cfg)

    def ref_loss(p):
        return jnp.mean(_reference_eps(p, tiny_unet_config(), inp) ** 2)

    want = jax.grad(ref_loss)(params)

    mesh = make_mesh_3d(4, sp=4)
    placed, apply_fn = make_sp_unet_apply(params, mesh, cfg)

    def sp_loss(p):
        eps = apply_fn(p, inp["sample"], inp["t"], inp["ehs"],
                       inp["text_embeds"], inp["time_ids"])
        return jnp.mean(eps ** 2)

    got = jax.grad(sp_loss)(placed)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5),
        got, want)


@pytest.mark.slow
def test_sp_tp_3d_forward_parity():
    """data=2 × seq=2 × model=2: batch over data, tokens over seq, heads
    over model — all three axes simultaneously."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(1), cfg)
    inp = _inputs(cfg, B=4)
    want = _reference_eps(params, cfg, inp)

    mesh = make_mesh_3d(8, sp=2, tp=2)
    placed, apply_fn = make_sp_unet_apply(params, mesh, cfg,
                                          tp_axis="model", data_axis="data")
    got = apply_fn(placed, inp["sample"], inp["t"], inp["ehs"],
                   inp["text_embeds"], inp["time_ids"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sp_attn_map_capture_parity():
    """The ip attention-map viz hook reassembles the full query axis under
    sequence sharding."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(4), cfg)
    inp = _inputs(cfg)
    want_eps, want_aux = _reference_eps(params, cfg, inp,
                                        capture_ip_attn_maps=True)

    mesh = make_mesh_3d(4, sp=4)
    rep = P()

    def local(p, sample, t, ehs, text_embeds, time_ids):
        return unet_apply(p, sample, t, ehs, added_text_embeds=text_embeds,
                          added_time_ids=time_ids, cfg=cfg, sp_axis="seq",
                          capture_ip_attn_maps=True)

    out_specs = jax.tree.map(lambda _: rep, (want_eps, want_aux))
    specs = jax.tree.map(lambda _: rep, params)
    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(specs, rep, rep, rep, rep, rep),
        out_specs=out_specs, check_vma=False))
    got_eps, got_aux = f(params, inp["sample"], inp["t"], inp["ehs"],
                         inp["text_embeds"], inp["time_ids"])
    np.testing.assert_allclose(np.asarray(got_eps), np.asarray(want_eps),
                               rtol=2e-5, atol=2e-5)
    assert len(got_aux["ip_attn_maps"]) == len(want_aux["ip_attn_maps"])
    for g, w in zip(got_aux["ip_attn_maps"], want_aux["ip_attn_maps"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("guidance_scale", [1.0, 5.0])
def test_sharded_inference_step_parity(guidance_scale):
    """The TP×SP serving wrapper around the full DDIM inference step (NeRF
    render → condition assembly → sharded U-Net scan → decode → metrics)
    matches the unsharded step — with and without classifier-free guidance
    (the CFG uncond pass must ride the same sharded U-Net)."""
    from test_joint_training import make_batch, tiny_joint_cfg

    from stable_nerf_tpu.models.diffusion import DDIMScheduler
    from stable_nerf_tpu.models.diffusion.sd_network import sd_network_init
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init
    from stable_nerf_tpu.training.inference import (
        make_inference_step, make_sharded_inference_step,
    )

    key = jax.random.PRNGKey(6)
    cfg = tiny_joint_cfg()
    k1, k2 = jax.random.split(key)
    params = {"sd": sd_network_init(k1, cfg.sd),
              "nerf": nerf_init(k2, cfg.nerf)}
    grid_state = grid_init(cfg.nerf)
    grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
    scheduler = DDIMScheduler.create(cfg.sd.scheduler)
    batch = make_batch(key, 2)

    # f32 so the parity bound is reduction-order only
    ref_fn = jax.jit(make_inference_step(cfg, scheduler, num_steps=3,
                                         compute_dtype=jnp.float32,
                                         guidance_scale=guidance_scale))
    want = ref_fn(params, grid_state, batch, key)

    mesh = make_mesh_3d(8, sp=2, tp=2)
    build = make_sharded_inference_step(cfg, scheduler, num_steps=3,
                                        mesh=mesh, tp=2, sp=2,
                                        compute_dtype=jnp.float32,
                                        guidance_scale=guidance_scale)
    placed, fn = build(params)
    got = fn(placed, grid_state, batch, key)

    np.testing.assert_allclose(float(got["psnr"].mean()),
                               float(want["psnr"].mean()), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["denoised_image"]),
                               np.asarray(want["denoised_image"]),
                               rtol=2e-4, atol=2e-4)


def test_sp_indivisible_sequence_raises():
    """A token count not divisible by the seq axis must fail loudly at
    trace time, not mis-shard."""
    cfg = tiny_unet_config()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    inp = _inputs(cfg, H=6)           # 6x6 -> 3x3 = 9 tokens, 9 % 8 != 0
    mesh = make_mesh_3d(8, sp=8)
    placed, apply_fn = make_sp_unet_apply(params, mesh, cfg)
    with pytest.raises(ValueError, match="not divisible"):
        apply_fn(placed, inp["sample"], inp["t"], inp["ehs"],
                 inp["text_embeds"], inp["time_ids"])
