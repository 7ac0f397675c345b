"""Stochastic one-corner hash encoding (the opt-in TPU training fast mode).

Checks the estimator's structural guarantees on CPU:
  * every stochastic output is exactly one of the 8 corner features;
  * corner selection frequencies match the trilinear weights (the
    unbiasedness argument: per-axis bits are Bernoulli(frac));
  * averaging over many perturbed draws converges to the exact encode;
  * custom-VJP backward produces a gradient supported on sampled corners
    whose expectation matches the dense gradient;
  * renderer integration: stochastic only engages when training
    (perturb_key given) and cfg.hash_stochastic is set.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.ops.encoding import (
    _cell_coords,
    _hash_grid_indices_stochastic,
    _hash_grid_indices_weights,
    _stateless_uniform3,
    hash_grid_encode,
    hash_grid_init,
)


def _cfg():
    return HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)


@pytest.mark.slow
def test_output_is_one_of_the_corners(key):
    cfg = HashGridConfig(n_levels=1, log2_hashmap_size=10, base_resolution=8)
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (64, 3))

    out = hash_grid_encode(params, x, cfg, stochastic=True)        # [64, F]
    flat_idx, _ = _hash_grid_indices_weights(x.astype(jnp.float32), cfg)
    corner_feats = params.table[flat_idx[:, 0]]                    # [64, 8, F]
    match = jnp.any(
        jnp.all(jnp.isclose(out[:, None, :], corner_feats, atol=1e-7), -1), 1
    )
    assert bool(jnp.all(match))


def test_selection_frequency_matches_trilinear_weight():
    """Pin one cell position replicated with distinct bit patterns: the
    sampled corner histogram must track the factorized weights."""
    cfg = HashGridConfig(n_levels=1, log2_hashmap_size=12, base_resolution=8)
    n = 20000
    # n distinct float positions inside one cell, all with the same
    # fractional weight up to ~1e-3 → near-identical target distribution
    base = np.asarray([0.33, 0.61, 0.27], np.float32)
    jitter = (np.random.default_rng(0).random((n, 3)).astype(np.float32)
              - 0.5) * 2e-4
    x = jnp.asarray(base[None] + jitter)

    p0, w = _cell_coords(x.astype(jnp.float32), cfg)
    u = _stateless_uniform3(x, cfg.n_levels)
    bits = np.asarray(u < w, np.int32)[:, 0]                       # [n, 3]
    freq = bits.mean(axis=0)
    np.testing.assert_allclose(freq, np.asarray(w)[:, 0].mean(axis=0),
                               atol=0.02)


def test_mean_over_draws_converges_to_exact(key):
    cfg = _cfg()
    params = hash_grid_init(key, cfg)
    # widen the table values so the comparison is non-trivial
    params = params._replace(
        table=jax.random.normal(key, params.table.shape))
    base = jax.random.uniform(jax.random.fold_in(key, 2), (32, 3),
                              minval=0.1, maxval=0.9)
    exact = hash_grid_encode(params, base, cfg)

    # the draw is seeded by the position bits: average over tiny jitters
    # (small enough to leave the exact encode essentially unchanged)
    n_draws = 600
    eps = jax.random.uniform(jax.random.fold_in(key, 3),
                             (n_draws, 32, 3), minval=-5e-5, maxval=5e-5)
    xs = jnp.clip(base[None] + eps, 0.0, 1.0)
    outs = jax.vmap(
        lambda xx: hash_grid_encode(params, xx, cfg, stochastic=True))(xs)
    mean = outs.mean(axis=0)
    # MC error ~ sigma/sqrt(600); loose tolerance on the feature scale
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact),
                               atol=0.2)


def test_custom_bwd_gradient_support_and_shape(key):
    cfg = _cfg()
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(key, (64, 3))

    def loss(table):
        out = hash_grid_encode(params._replace(table=table), x, cfg,
                               custom_bwd=True, stochastic=True)
        return jnp.sum(out)

    g = jax.grad(loss)(params.table)
    assert g.shape == params.table.shape
    flat_idx, _ = _hash_grid_indices_stochastic(x.astype(jnp.float32), cfg)
    touched = np.unique(np.asarray(flat_idx).ravel())
    nz = np.nonzero(np.abs(np.asarray(g)).sum(axis=-1))[0]
    assert set(nz).issubset(set(touched.tolist()))
    # one corner per (sample, level): at most M*L touched rows
    assert len(nz) <= 64 * cfg.n_levels


def test_stochastic_matches_custom_and_plain_paths(key):
    cfg = _cfg()
    params = hash_grid_init(key, cfg)
    x = jax.random.uniform(key, (32, 3))
    a = hash_grid_encode(params, x, cfg, custom_bwd=False, stochastic=True)
    b = hash_grid_encode(params, x, cfg, custom_bwd=True, stochastic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_stochastic_training_converges(key):
    """SGD through the stochastic estimator fits a smooth target: the
    gradient noise must not break optimization (unbiasedness in practice)."""
    import optax

    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    params = hash_grid_init(key, cfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params.table)

    def target(x):
        return jnp.sin(4.0 * x[..., :1]) * jnp.cos(3.0 * x[..., 1:2])

    proj = jax.random.normal(jax.random.fold_in(key, 1),
                             (cfg.output_dim, 1)) * 0.5

    @jax.jit
    def step(table, opt_state, k):
        x = jax.random.uniform(k, (256, 3))

        def loss_fn(t):
            enc = hash_grid_encode(params._replace(table=t), x, cfg,
                                   custom_bwd=True, stochastic=True)
            return jnp.mean((enc @ proj - target(x)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(table)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(table, upd), opt_state, loss

    table = params.table
    losses = []
    for i in range(120):
        table, opt_state, loss = step(table, opt_state,
                                      jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])


def test_renderer_stochastic_gating(key):
    """cfg.hash_stochastic + perturb_key → stochastic; eval render (no
    perturb) must be the exact path (identical to hash_stochastic=False)."""
    from stable_nerf_tpu.models.nerf import grid_init, nerf_init, render
    from stable_nerf_tpu.data.rays import get_rays, rand_poses

    cfg_fast = NeRFConfig(grid_size=32, hash_stochastic=True,
                          encoding_sigma=HashGridConfig(
                              n_levels=4, log2_hashmap_size=10,
                              base_resolution=4))
    cfg_exact = NeRFConfig(grid_size=32, hash_stochastic=False,
                           encoding_sigma=HashGridConfig(
                               n_levels=4, log2_hashmap_size=10,
                               base_resolution=4))
    params = nerf_init(key, cfg_fast)
    state = grid_init(cfg_fast)
    state = state._replace(occ=jnp.ones_like(state.occ))
    rays = get_rays(rand_poses(key, 1, radius=2.0), (16.0, 16.0, 8, 8), 16, 16)
    o, d = rays["rays_o"], rays["rays_d"]

    # eval (no perturb): identical regardless of the flag
    out_fast = render(params, state, o, d, cfg_fast, max_steps=32)
    out_exact = render(params, state, o, d, cfg_exact, max_steps=32)
    np.testing.assert_allclose(np.asarray(out_fast["image"]),
                               np.asarray(out_exact["image"]), rtol=1e-6)

    # train (perturb): stochastic path engages → differs from exact
    pk = jax.random.fold_in(key, 7)
    tr_fast = render(params, state, o, d, cfg_fast, max_steps=32,
                     perturb_key=pk)
    tr_exact = render(params, state, o, d, cfg_exact, max_steps=32,
                      perturb_key=pk)
    assert not np.allclose(np.asarray(tr_fast["image"]),
                           np.asarray(tr_exact["image"]))
