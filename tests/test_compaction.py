"""Compaction op tests: pack/unpack roundtrip, budget overflow, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.ops.compaction import (
    compact_plan,
    gather_compact,
    scatter_back,
)


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


def test_budget_overflow_drops_tail(rng):
    valid = jnp.ones((4, 8), bool)
    budget = 16                                    # half of 32
    plan = compact_plan(valid, budget)
    assert int(plan.n_valid) == 16
    nv = np.asarray(plan.new_valid).reshape(-1)
    assert nv.sum() == 16
    # front-first: the FIRST 16 flat samples survive
    assert np.all(nv[:16]) and not np.any(nv[16:])


def test_packed_order_is_flat_order(rng):
    valid = jnp.asarray([[True, False, True], [False, True, False]])
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    plan = compact_plan(valid, 4)
    packed = np.asarray(gather_compact(plan, x))
    np.testing.assert_allclose(packed, [0, 2, 4, 0])   # slots: x00, x02, x11, unused


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
