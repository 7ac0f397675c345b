"""Encoding tests: hash-grid interpolation properties, SH orthogonality,
frequency encoding shapes/values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.config import HashGridConfig
from stable_nerf_tpu.ops.encoding import (
    freq_encoding,
    hash_grid_encode,
    hash_grid_init,
    sh_encoding,
)


class TestHashGrid:
    cfg = HashGridConfig()

    def test_shapes_and_dtype(self, key):
        params = hash_grid_init(key, self.cfg)
        assert params.table.shape == (16 * 2 ** 19, 2)
        x = jax.random.uniform(key, (37, 3))
        out = hash_grid_encode(params, x, self.cfg)
        assert out.shape == (37, 32)

    def test_batch_shape_polymorphism(self, key):
        params = hash_grid_init(key, self.cfg)
        x = jax.random.uniform(key, (4, 5, 3))
        out = hash_grid_encode(params, x, self.cfg)
        flat = hash_grid_encode(params, x.reshape(-1, 3), self.cfg)
        assert out.shape == (4, 5, 32)
        np.testing.assert_allclose(np.asarray(out.reshape(-1, 32)),
                                   np.asarray(flat), rtol=1e-6)

    def test_continuity(self, key):
        """Trilinear interpolation → small input deltas give small output deltas."""
        params = hash_grid_init(key, self.cfg)
        x = jnp.asarray([[0.31, 0.52, 0.77]])
        e1 = hash_grid_encode(params, x, self.cfg)
        e2 = hash_grid_encode(params, x + 1e-6, self.cfg)
        assert float(jnp.max(jnp.abs(e1 - e2))) < 1e-4

    def test_gradient_reaches_table(self, key):
        params = hash_grid_init(key, self.cfg)
        x = jax.random.uniform(key, (16, 3))

        def loss(table):
            return jnp.sum(hash_grid_encode(params._replace(table=table), x, self.cfg) ** 2)

        g = jax.grad(loss)(params.table)
        assert float(jnp.sum(jnp.abs(g))) > 0
        # only touched corners get gradient: at most 16 points × 16 levels × 8
        assert int(jnp.sum(jnp.any(g != 0, axis=-1))) <= 16 * 16 * 8

    def test_coarse_level_is_dense(self):
        """Base res 16 → 17³ = 4913 < 2^19: level 0 must use dense indexing,
        so distinct coarse cells never collide."""
        params = hash_grid_init(jax.random.PRNGKey(1), self.cfg)
        # two positions in different coarse cells must generally differ
        a = hash_grid_encode(params, jnp.asarray([[0.1, 0.1, 0.1]]), self.cfg)
        b = hash_grid_encode(params, jnp.asarray([[0.9, 0.9, 0.9]]), self.cfg)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestSH:
    def test_shapes(self):
        d = jnp.asarray([[0.5, 0.5, 1.0]])
        for deg in (1, 2, 3, 4):
            assert sh_encoding(d, deg).shape == (1, deg ** 2)

    def test_orthonormality(self, rng):
        """Monte-Carlo: ∫ Y_i Y_j dΩ = δ_ij over the sphere."""
        n = 50_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        y = np.asarray(sh_encoding(jnp.asarray((v + 1) / 2), 4))  # input in [0,1]
        gram = 4 * np.pi * (y.T @ y) / n
        np.testing.assert_allclose(gram, np.eye(16), atol=0.08)

    def test_constant_band(self):
        d = jnp.asarray([[0.1, 0.7, 0.3], [0.9, 0.2, 0.6]])
        y = sh_encoding(d, 4)
        np.testing.assert_allclose(np.asarray(y[:, 0]), 0.28209479, rtol=1e-5)


class TestFreq:
    def test_shape(self):
        x = jnp.zeros((7, 3))
        assert freq_encoding(x, 6, True).shape == (7, 3 + 36)
        assert freq_encoding(x, 6, False).shape == (7, 36)

    def test_values(self):
        x = jnp.asarray([[0.5, 0.0, 0.0]])
        enc = freq_encoding(x, 2, include_input=True)
        e = np.asarray(enc)[0]
        np.testing.assert_allclose(e[:3], [0.5, 0, 0], atol=1e-7)
        # octave 0: sin(x), cos(x) for each dim; octave 1: sin(2x), cos(2x)
        np.testing.assert_allclose(e[3], np.sin(0.5), rtol=1e-6)
        np.testing.assert_allclose(e[6], np.cos(0.5), rtol=1e-6)
        np.testing.assert_allclose(e[9], np.sin(1.0), rtol=1e-6)
        np.testing.assert_allclose(e[12], np.cos(1.0), rtol=1e-6)
