"""Error-map sampling + EMA update tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.data.rays import get_rays
from stable_nerf_tpu.models.nerf.error_map import error_map_init, update_error_map


def test_init_shape():
    em = error_map_init(4, 16)
    assert em.shape == (4, 256)
    assert float(em.min()) == 1.0


def test_update_ema(key):
    em = error_map_init(2, 4)                       # [2, 16]
    index = jnp.asarray([1])
    inds = jnp.asarray([[3, 7]])
    err = jnp.asarray([[0.5, 0.0]])
    em2 = update_error_map(em, index, inds, err)
    # updated cells: 0.1*1 + 0.9*err
    np.testing.assert_allclose(float(em2[1, 3]), 0.1 + 0.45, rtol=1e-6)
    np.testing.assert_allclose(float(em2[1, 7]), 0.1, rtol=1e-6)
    # untouched rows/cells unchanged
    np.testing.assert_allclose(np.asarray(em2[0]), 1.0)
    np.testing.assert_allclose(float(em2[1, 0]), 1.0)


def test_error_map_sampling_prefers_high_error(key):
    """get_rays error-map mode samples mostly from the high-error region."""
    B, H, W, N = 1, 256, 256, 512
    em = np.full((B, 128 * 128), 1e-4, np.float32)
    em[:, : 128 * 16] = 10.0                        # top 1/8 rows hot
    poses = jnp.eye(4)[None]
    out = get_rays(poses, (100.0, 100.0, 128.0, 128.0), H, W, N=N, key=key,
                   error_map=jnp.asarray(em))
    assert "inds_coarse" in out
    frac_hot = float(jnp.mean(out["inds_coarse"] < 128 * 16))
    assert frac_hot > 0.95
    # full-res indices in range and concentrated in the top rows
    assert int(out["inds"].max()) < H * W
    rows = np.asarray(out["inds"][0]) // W
    assert np.mean(rows < H / 8 + 4) > 0.9
