"""Hybrid stochastic hash encoding (hash_stochastic_min_level).

The hybrid keeps the exact 8-corner trilinear interpolation on the coarse
levels [0, k) and one-corner sampling on the fine levels [k, L).  Checks:
  * the coarse block of the hybrid output equals the exact encode's, and
    the fine block equals the fully-stochastic encode's (the sampler is
    seeded by absolute level id, so sliced draws match full-range draws);
  * boundary values of k reduce to the pure modes;
  * custom-VJP gradients equal autodiff through the plain hybrid path
    (CPU scatter fallback — the Pallas kernel's correctness oracle);
  * renderer/network integration via NeRFConfig.hash_stochastic_min_level.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.ops.encoding import (
    hash_grid_encode,
    hash_grid_init,
)


def _cfg():
    return HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)


def _params_x(key, cfg, n=48):
    params = hash_grid_init(key, cfg)
    params = params._replace(table=jax.random.normal(key, params.table.shape))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3))
    return params, x


@pytest.mark.slow
def test_hybrid_blocks_match_pure_modes(key):
    cfg = _cfg()
    params, x = _params_x(key, cfg)
    F = cfg.n_features_per_level
    k = 2

    exact = hash_grid_encode(params, x, cfg)
    stoch = hash_grid_encode(params, x, cfg, stochastic=True)
    hybrid = hash_grid_encode(params, x, cfg, stochastic=True,
                              stochastic_min_level=k)

    np.testing.assert_allclose(np.asarray(hybrid[:, : k * F]),
                               np.asarray(exact[:, : k * F]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hybrid[:, k * F:]),
                               np.asarray(stoch[:, k * F:]), rtol=1e-6)


def test_hybrid_boundary_levels_reduce_to_pure_modes(key):
    cfg = _cfg()
    params, x = _params_x(key, cfg)

    exact = hash_grid_encode(params, x, cfg)
    stoch = hash_grid_encode(params, x, cfg, stochastic=True)

    h0 = hash_grid_encode(params, x, cfg, stochastic=True,
                          stochastic_min_level=0)
    hL = hash_grid_encode(params, x, cfg, stochastic=True,
                          stochastic_min_level=cfg.n_levels)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(stoch), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hL), np.asarray(exact), rtol=1e-6)
    # min_level irrelevant without the stochastic flag
    off = hash_grid_encode(params, x, cfg, stochastic=False,
                           stochastic_min_level=2)
    np.testing.assert_allclose(np.asarray(off), np.asarray(exact), rtol=1e-6)


def test_hybrid_custom_vjp_matches_autodiff(key):
    cfg = _cfg()
    params, x = _params_x(key, cfg)
    k = 2
    cot = jax.random.normal(jax.random.fold_in(key, 3),
                            (x.shape[0], cfg.output_dim))

    def loss(table, custom):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=custom, stochastic=True,
                               stochastic_min_level=k)
        return jnp.sum(out * cot)

    g_custom = jax.grad(lambda t: loss(t, True))(params.table)
    g_auto = jax.grad(lambda t: loss(t, False))(params.table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-6)


def test_hybrid_custom_vjp_grad_bf16_shape_and_support(key):
    cfg = _cfg()
    params, x = _params_x(key, cfg)

    def loss(table):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=True, stochastic=True,
                               grad_bf16=True, stochastic_min_level=2)
        return jnp.sum(out)

    g = jax.grad(loss)(params.table)
    assert g.shape == params.table.shape
    assert np.isfinite(np.asarray(g)).all()
    # fine-level rows: at most one corner per (sample, level)
    T = cfg.table_size
    fine = np.abs(np.asarray(g[2 * T:])).sum(axis=-1)
    assert (fine != 0).sum() <= x.shape[0] * (cfg.n_levels - 2)


def test_renderer_hybrid_gating(key):
    """Hybrid engages in training renders only; eval stays exact."""
    from stable_nerf_tpu.data.rays import get_rays, rand_poses
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init, render

    enc = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    mk = lambda **kw: NeRFConfig(grid_size=32, encoding_sigma=enc, **kw)
    cfg_h = mk(hash_stochastic=True, hash_stochastic_min_level=2)
    cfg_s = mk(hash_stochastic=True)
    cfg_e = mk()
    params = nerf_init(key, cfg_h)
    state = grid_init(cfg_h)
    state = state._replace(occ=jnp.ones_like(state.occ))
    rays = get_rays(rand_poses(key, 1, radius=2.0), (16.0, 16.0, 8, 8), 16, 16)
    o, d = rays["rays_o"], rays["rays_d"]

    # eval (no perturb): exact regardless of mode
    out_h = render(params, state, o, d, cfg_h, max_steps=32)
    out_e = render(params, state, o, d, cfg_e, max_steps=32)
    np.testing.assert_allclose(np.asarray(out_h["image"]),
                               np.asarray(out_e["image"]), rtol=1e-6)

    # train: hybrid differs from both pure modes
    pk = jax.random.fold_in(key, 7)
    tr_h = render(params, state, o, d, cfg_h, max_steps=32, perturb_key=pk)
    tr_s = render(params, state, o, d, cfg_s, max_steps=32, perturb_key=pk)
    tr_e = render(params, state, o, d, cfg_e, max_steps=32, perturb_key=pk)
    assert not np.allclose(np.asarray(tr_h["image"]), np.asarray(tr_e["image"]))
    assert not np.allclose(np.asarray(tr_h["image"]), np.asarray(tr_s["image"]))
