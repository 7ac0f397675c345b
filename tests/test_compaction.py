"""Compaction op tests: pack/unpack roundtrip, budget overflow, gradients."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.ops.compaction import (
    compact_plan,
    gather_compact,
    scatter_back,
    suggest_sample_budget,
)


def test_suggest_sample_budget_policy():
    """Adaptive mean_count-style policy: dense while the grid is fog,
    power-of-two buckets with headroom once it sparsifies, floor at
    min_budget."""
    # fog phase → dense (None): a binding budget would truncate mid-ray
    assert suggest_sample_budget(0.9, 8192, 256) is None
    assert suggest_sample_budget(0.5, 8192, 256) is None
    # sparse → pow2 bucket covering occ*headroom*dense
    b = suggest_sample_budget(0.1, 8192, 256)
    assert b is not None and b & (b - 1) == 0            # power of two
    assert b >= 0.1 * 1.5 * 8192 * 256
    assert b < 8192 * 256
    # very sparse → floor
    assert suggest_sample_budget(1e-5, 8192, 256) == 2 ** 16
    # monotone in occupancy
    assert suggest_sample_budget(0.05, 8192, 256) <= suggest_sample_budget(
        0.2, 8192, 256)


def test_roundtrip_under_budget(rng):
    valid = jnp.asarray(rng.uniform(size=(8, 16)) < 0.3)
    x = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
    budget = 128                                   # > total valid
    plan = compact_plan(valid, budget)
    packed = gather_compact(plan, x)
    back = scatter_back(plan, packed, 8 * 16).reshape(8, 16, 3)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(back)[v], np.asarray(x)[v], rtol=1e-6)
    assert np.all(np.asarray(back)[~v] == 0)
    assert int(plan.n_valid) == v.sum()
    assert np.array_equal(np.asarray(plan.new_valid), v)


def test_budget_overflow_drops_per_ray_tails(rng):
    valid = jnp.ones((4, 8), bool)
    budget = 16                                    # half of 32
    plan = compact_plan(valid, budget)
    assert int(plan.n_valid) == 16
    nv = np.asarray(plan.new_valid)
    assert nv.sum() == 16
    # step-major: every ray keeps its first 4 steps, loses its tail —
    # no ray is starved
    assert np.all(nv[:, :4]) and not np.any(nv[:, 4:])


def test_packed_order_is_step_major(rng):
    valid = jnp.asarray([[True, False, True], [False, True, False]])
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    plan = compact_plan(valid, 4)
    packed = np.asarray(gather_compact(plan, x))
    # (step, ray) fill order: x00 (k0,n0), x11 (k1,n1), x02 (k2,n0)
    np.testing.assert_allclose(packed, [0, 4, 2, 0])


def test_overflow_keeps_near_samples_of_every_ray(rng):
    # ragged validity: ray 0 valid everywhere, ray 1 only late steps
    valid = jnp.asarray([[True] * 6, [False, False, True, True, True, True]])
    plan = compact_plan(valid, 6)
    nv = np.asarray(plan.new_valid)
    # fill order is (k,n): k0n0, k1n0, k2n0, k2n1, k3n0, k3n1 → budget 6
    assert nv.sum() == 6
    assert np.array_equal(nv[0], [True, True, True, True, False, False])
    assert np.array_equal(nv[1], [False, False, True, True, False, False])


def test_gradients_flow_through_roundtrip(rng):
    valid = jnp.asarray(rng.uniform(size=(4, 8)) < 0.5)
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    plan = compact_plan(valid, 32)

    def f(x):
        packed = gather_compact(plan, x)
        y = packed * 2.0                            # stand-in for the MLP
        back = scatter_back(plan, y, 32).reshape(4, 8)
        return jnp.sum(back ** 2)

    g = jax.grad(f)(x)
    v = np.asarray(valid)
    expect = 8.0 * np.asarray(x) * v                # d/dx (2x)^2 on valid
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


@pytest.mark.slow
def test_overbudget_render_equals_masked_dense(rng, key):
    """In the over-budget regime the budgeted render must be EXACTLY the
    dense render restricted to the kept-sample mask — same loss, same
    gradients.  (Guards the whole pack→eval→unpack gradient plumbing;
    the kept set itself is compact_plan's step-major semantics.)"""
    import jax
    from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init, render
    from stable_nerf_tpu.models.nerf.network import nerf_apply
    from stable_nerf_tpu.ops.composite import composite_rays
    from stable_nerf_tpu.ops.marching import march_rays_lattice
    from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb

    cfg = NeRFConfig(grid_size=32, density_activation="trunc_exp",
                     encoding_sigma=HashGridConfig(n_levels=4,
                                                   log2_hashmap_size=12,
                                                   base_resolution=4))
    params = nerf_init(key, cfg)
    st = grid_init(cfg)
    st = st._replace(occ=jnp.ones_like(st.occ))
    poses = rand_poses(key, 1, radius=1.32)
    rays = get_rays(poses, (64.0, 64.0, 8.0, 8.0), 16, 16)
    o = rays["rays_o"].reshape(-1, 3)
    d = rays["rays_d"].reshape(-1, 3)
    gt = jnp.linspace(0, 1, 256 * cfg.channel_dim).reshape(256, cfg.channel_dim)
    budget = 2048                       # M = 256*32 = 8192, all valid → binds

    def budget_loss(p):
        out = render(p, st, o, d, cfg, bg_color=1.0, max_steps=32,
                     sample_budget=budget)
        return jnp.mean((out["image"] - gt) ** 2)

    def masked_dense_loss(p):
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        pos, ts, dt, valid, t0 = march_rays_lattice(
            o, d, nears, fars, st.occ, bound=cfg.bound, cascade=cfg.cascade,
            grid_size=cfg.grid_size, max_steps=32, noise=None)
        N, K = ts.shape
        nv = compact_plan(valid, budget).new_valid
        dirs = jnp.broadcast_to(d[:, None, :], (N, K, 3))
        sig, rgb = nerf_apply(p, pos.reshape(-1, 3), dirs.reshape(-1, 3), cfg)
        sig = sig.reshape(N, K) * nv.astype(jnp.float32)
        rgb = (rgb.reshape(N, K, -1) * nv.astype(jnp.float32)[..., None])
        ws, _depth, img = composite_rays(sig, rgb, dt, ts, t0, nv)
        img = img + (1.0 - ws)[:, None] * 1.0
        return jnp.mean((img - gt) ** 2)

    l1, g1 = jax.value_and_grad(budget_loss)(params)
    l2, g2 = jax.value_and_grad(masked_dense_loss)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_renderer_budget_matches_dense(rng, key):
    """Rendering with a generous budget must equal dense rendering."""
    from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init, render

    cfg = NeRFConfig(grid_size=32,
                     encoding_sigma=HashGridConfig(n_levels=4,
                                                   log2_hashmap_size=12,
                                                   base_resolution=4))
    params = nerf_init(key, cfg)
    st = grid_init(cfg)
    st = st._replace(occ=jnp.ones_like(st.occ))
    poses = rand_poses(key, 1, radius=2.0)
    rays = get_rays(poses, (64.0, 64.0, 8.0, 8.0), 16, 16)

    dense = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                   bg_color=1.0, max_steps=32)
    budgeted = render(params, st, rays["rays_o"], rays["rays_d"], cfg,
                      bg_color=1.0, max_steps=32, sample_budget=256 * 32 - 1)
    # budget 8191 < 8192 lattice → compaction path, but all valid fit
    np.testing.assert_allclose(np.asarray(budgeted["image"]),
                               np.asarray(dense["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(budgeted["weights_sum"]),
                               np.asarray(dense["weights_sum"]), atol=1e-5)


def test_scatter_back_vjp_matches_scatter_formulation(rng):
    """The gather-based unpack (fwd and custom VJP bwd) must match the
    .at[idx].set scatter formulation in value and gradient."""
    import jax

    from stable_nerf_tpu.ops.compaction import compact_plan, scatter_back

    N, K, budget = 7, 13, 32
    valid = jnp.asarray(rng.random((N, K)) < 0.6)
    plan = compact_plan(valid, budget)
    values = jnp.asarray(rng.standard_normal((budget, 3)).astype(np.float32))
    nk = N * K

    def scatter_ref(v):
        idx = jnp.where(plan.slot_used, plan.src_idx, nk)
        return jnp.zeros((nk, 3), v.dtype).at[idx].set(v, mode="drop")

    out = scatter_back(plan, values, nk)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(scatter_ref(values)))

    cot = jnp.asarray(rng.standard_normal((nk, 3)).astype(np.float32))
    g_new = jax.grad(lambda v: jnp.vdot(scatter_back(plan, v, nk), cot))(values)
    g_ref = jax.grad(lambda v: jnp.vdot(scatter_ref(v), cot))(values)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
