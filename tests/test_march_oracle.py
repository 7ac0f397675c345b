"""Iterative-march oracle vs the masked lattice: at dt_gamma=0 the two must
produce the SAME sample set (the lattice-equivalence theorem the TPU design
rests on — ops/marching.py module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.ops.marching import (
    march_rays_iterative,
    march_rays_lattice,
)
from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb


def _setup(occ_pattern, H=32, n_rays=16, seed=0):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(occ_pattern(rng, H))[None]           # cascade 1
    o = rng.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    o[:, 2] = -3.0
    # aim at random points well inside the box → guaranteed hits
    target = rng.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    return grid, o, d, nears, fars


PATTERNS = {
    "full": lambda rng, H: np.ones((H, H, H), bool),
    "random": lambda rng, H: rng.uniform(size=(H, H, H)) < 0.3,
    "slab": lambda rng, H: np.pad(
        np.ones((H, H, H // 4), bool), ((0, 0), (0, 0), (H // 2, H - H // 2 - H // 4))
    ),
}


@pytest.mark.parametrize("pattern", list(PATTERNS))
def test_lattice_equals_iterative_at_dt_gamma_zero(pattern):
    grid, o, d, nears, fars = _setup(PATTERNS[pattern])
    kw = dict(bound=1.0, cascade=1, grid_size=32, max_steps=64)

    pos_l, ts_l, dt, valid_l, t0_l = march_rays_lattice(
        o, d, nears, fars, grid, **kw)
    xyz_i, ts_i, dts_i, dd_i, valid_i, t0_i = march_rays_iterative(
        o, d, nears, fars, grid, **kw)

    np.testing.assert_allclose(np.asarray(t0_l), np.asarray(t0_i), rtol=1e-6)
    nl = np.asarray(valid_l.sum(-1))
    ni = np.asarray(valid_i.sum(-1))
    # Two benign float-boundary divergences exist:
    #  * serial t += dt vs fused t0 + k·dt rounding at the far edge;
    #  * the CUDA-style analytic skip can jump past a lattice point sitting
    #    exactly on a voxel boundary whose voxel IS occupied — the lattice
    #    tests every point directly and keeps it.
    # Hence: iterative samples ⊆ lattice samples, within ≤2 per ray.
    assert np.all(nl - ni >= 0) and np.all(nl - ni <= 2), (nl, ni)
    assert np.mean(nl == ni) >= 0.7

    for r in range(o.shape[0]):
        lat_ts = np.asarray(ts_l[r])[np.asarray(valid_l[r])]
        it_ts = np.asarray(ts_i[r])[: ni[r]]
        # every iterative sample must match some lattice sample
        for t in it_ts:
            assert np.min(np.abs(lat_ts - t)) < 1e-4, (r, t)
        # per-sample dt is the constant lattice dt
        np.testing.assert_allclose(np.asarray(dts_i[r])[: ni[r]], float(dt),
                                   rtol=1e-6)


def test_iterative_dt_gamma_positive_runs():
    """Cone-angle stepping (dt_gamma > 0): monotone ts, growing steps."""
    grid, o, d, nears, fars = _setup(PATTERNS["full"], n_rays=4)
    xyz, ts, dts, dd, valid, t0 = march_rays_iterative(
        o, d, nears, fars, grid, bound=1.0, cascade=1, grid_size=32,
        max_steps=64, dt_gamma=0.05)
    n = np.asarray(valid.sum(-1))
    assert np.all(n > 0)
    for r in range(4):
        tt = np.asarray(ts[r])[: n[r]]
        st = np.asarray(dts[r])[: n[r]]
        assert np.all(np.diff(tt) > 0)
        # step sizes grow with distance (clamped)
        assert st[-1] >= st[0]


def test_iterative_perturb_matches_lattice_offset():
    grid, o, d, nears, fars = _setup(PATTERNS["full"], n_rays=2)
    noise = jnp.asarray([0.25, 0.75])
    kw = dict(bound=1.0, cascade=1, grid_size=32, max_steps=64, noise=noise)
    _, ts_l, dt, valid_l, t0_l = march_rays_lattice(o, d, nears, fars, grid, **kw)
    _, ts_i, _, _, valid_i, t0_i = march_rays_iterative(o, d, nears, fars, grid, **kw)
    np.testing.assert_allclose(np.asarray(t0_l), np.asarray(t0_i), rtol=1e-6)
    assert np.array_equal(np.asarray(valid_l.sum(-1)), np.asarray(valid_i.sum(-1)))
