"""March tests: the masked lattice must reproduce the CUDA DDA semantics
(dt_gamma = 0) — uniform lattice + occupancy mask + max_steps cap."""

import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.ops.marching import (
    march_rays_lattice,
    mip_from_dt,
    mip_from_pos,
    occupancy_lookup,
)
from stable_nerf_tpu.ops.ray_ops import near_far_from_aabb


def test_mip_from_pos_levels():
    pos = jnp.asarray([[0.3, 0.0, 0.0], [0.6, 0.0, 0.0], [1.5, 0.0, 0.0],
                       [3.0, 0.0, 0.0]])
    lv = np.asarray(mip_from_pos(pos, cascade=3))
    # frexp exponent: 0.3→-1 clamp 0; 0.6→0; 1.5→1; 3.0→2
    assert lv.tolist() == [0, 0, 1, 2]


def test_mip_from_dt():
    # dt*H/2 = 0.866 for the standard config → exponent 0
    dt = jnp.float32(2 * np.sqrt(3) / 256)
    assert int(mip_from_dt(dt, 128, 4)) == 0


def test_occupancy_lookup_single_voxel():
    H, C, bound = 128, 1, 1.0
    grid = jnp.zeros((C, H, H, H), bool)
    # voxel containing the origin: index floor(0.5*(0+1)*128) = 64
    grid = grid.at[0, 64, 64, 64].set(True)
    dt = 2 * np.sqrt(3) / 256
    pos = jnp.asarray([[0.001, 0.001, 0.001], [0.5, 0.5, 0.5]])
    occ = occupancy_lookup(grid, pos, dt, bound, C, H)
    assert bool(occ[0]) and not bool(occ[1])


def test_march_full_grid_uniform_lattice():
    """With a fully-occupied grid the lattice must cover [near, far) at
    dt = 2·sqrt(3)/max_steps, exactly as the CUDA kernel."""
    H, C, bound, K = 128, 1, 1.0, 256
    grid = jnp.ones((C, H, H, H), bool)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    pos, ts, dt, valid, t0 = march_rays_lattice(
        o, d, nears, fars, grid, bound=bound, cascade=C, grid_size=H,
        max_steps=K,
    )
    assert pos.shape == (1, K, 3) and valid.shape == (1, K)
    np.testing.assert_allclose(float(dt), 2 * np.sqrt(3) / K, rtol=1e-6)
    v = np.asarray(valid[0])
    tsn = np.asarray(ts[0])
    # valid exactly while t < far
    np.testing.assert_array_equal(v, tsn < float(fars[0]))
    # lattice spacing is dt (float32 accumulation → loose tolerance)
    np.testing.assert_allclose(np.diff(tsn), float(dt), rtol=1e-3)
    assert np.isclose(tsn[0], float(nears[0]))


def test_march_empty_grid_no_valid_samples():
    H, C = 128, 1
    grid = jnp.zeros((C, H, H, H), bool)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    _, _, _, valid, _ = march_rays_lattice(
        o, d, nears, fars, grid, bound=1.0, cascade=C, grid_size=H, max_steps=256
    )
    assert int(jnp.sum(valid)) == 0


def test_march_missed_ray_invalid():
    H, C = 128, 1
    grid = jnp.ones((C, H, H, H), bool)
    o = jnp.asarray([[0.0, 5.0, -3.0]])    # passes above the box
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    pos, ts, dt, valid, _ = march_rays_lattice(
        o, d, nears, fars, grid, bound=1.0, cascade=C, grid_size=H, max_steps=256
    )
    assert int(jnp.sum(valid)) == 0
    assert bool(jnp.all(jnp.isfinite(pos)))   # clamped, no inf/nan leaks


def test_march_half_occupied():
    """Only the z>0 half occupied → samples valid only there."""
    H, C = 128, 1
    grid = jnp.zeros((C, H, H, H), bool).at[:, :, :, H // 2:].set(True)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    pos, ts, dt, valid, _ = march_rays_lattice(
        o, d, nears, fars, grid, bound=1.0, cascade=C, grid_size=H, max_steps=256
    )
    z = np.asarray(pos[0, :, 2])
    v = np.asarray(valid[0])
    assert v.sum() > 0
    assert np.all(z[v] >= 0.0)
    in_range = np.asarray(ts[0]) < float(fars[0])
    assert not np.any(v[~in_range])


def test_max_steps_cap_with_oversized_lattice():
    """For bound=1, range/dt <= max_steps always (dt = diag/max_steps), so the
    cap only binds with an artificially large far — exercise the mechanism."""
    H, C, K_lattice, max_steps = 128, 1, 64, 16
    grid = jnp.ones((C, H, H, H), bool)
    o = jnp.asarray([[0.0, 0.0, -0.9]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears = jnp.asarray([0.2])
    fars = jnp.asarray([100.0])   # beyond the whole lattice
    _, _, _, valid, _ = march_rays_lattice(
        o, d, nears, fars, grid, bound=1.0, cascade=C, grid_size=H,
        max_steps=max_steps, n_samples=K_lattice,
    )
    # all 64 lattice points are in-range and occupied → capped at max_steps
    assert int(jnp.sum(valid)) == max_steps
    # and the cap keeps the first max_steps samples
    assert bool(jnp.all(valid[0, :max_steps]))


def test_perturb_shifts_t0():
    H, C = 128, 1
    grid = jnp.ones((C, H, H, H), bool)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.asarray([-1., -1, -1, 1, 1, 1]))
    noise = jnp.asarray([0.5])
    _, ts, dt, _, t0 = march_rays_lattice(
        o, d, nears, fars, grid, bound=1.0, cascade=C, grid_size=H,
        max_steps=256, noise=noise,
    )
    np.testing.assert_allclose(float(t0[0]), float(nears[0]) + 0.5 * float(dt),
                               rtol=1e-6)
