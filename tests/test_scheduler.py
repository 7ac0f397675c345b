"""DDIM scheduler numerics tests (golden formulas + roundtrip properties)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_nerf_tpu.config import SchedulerConfig
from stable_nerf_tpu.models.diffusion.scheduler import DDIMScheduler


def make():
    return DDIMScheduler.create(SchedulerConfig())


class TestBetas:
    def test_scaled_linear_alphas(self):
        s = make()
        acp = np.asarray(s.alphas_cumprod)
        assert acp.shape == (1000,)
        # golden endpoints for SDXL config
        np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
        assert 0.0046 < acp[-1] < 0.0047          # known SDXL value ~0.00466
        assert np.all(np.diff(acp) < 0)

    def test_final_alpha_is_acp0(self):
        s = make()   # set_alpha_to_one = False for SDXL
        np.testing.assert_allclose(float(s.final_alpha_cumprod),
                                   float(s.alphas_cumprod[0]))


class TestAddNoise:
    def test_formula(self, key):
        s = make()
        x = jax.random.normal(key, (2, 4, 8, 8))
        n = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
        t = jnp.asarray([0, 999])
        out = s.add_noise(x, n, t)
        acp = np.asarray(s.alphas_cumprod)
        for b, tt in enumerate([0, 999]):
            expect = np.sqrt(acp[tt]) * np.asarray(x[b]) + np.sqrt(1 - acp[tt]) * np.asarray(n[b])
            np.testing.assert_allclose(np.asarray(out[b]), expect, rtol=1e-5)

    def test_t0_mostly_signal(self, key):
        s = make()
        x = jnp.ones((1, 4, 4, 4))
        n = jnp.zeros_like(x)
        out = s.add_noise(x, n, jnp.asarray([0]))
        np.testing.assert_allclose(np.asarray(out), np.sqrt(1 - 0.00085), rtol=1e-5)


class TestTimesteps:
    def test_leading_spacing_50(self):
        s = make()
        ts = s.timesteps(50)
        assert ts.shape == (50,)
        assert ts[0] == 981 and ts[-1] == 1      # (49*20)+1 … 0+1
        assert np.all(np.diff(ts) == -20)


class TestStep:
    def test_perfect_eps_recovers_x0_chain(self, key):
        """Denoising with the TRUE noise as model output must walk back to x0
        exactly (eta=0 DDIM inverts add_noise along the trajectory)."""
        s = make()
        x0 = jax.random.normal(key, (1, 4, 8, 8))
        eps = jax.random.normal(jax.random.fold_in(key, 7), x0.shape)
        num_steps = 50
        ts = s.timesteps(num_steps)
        t = jnp.asarray(ts[0])
        x_t = s.add_noise(x0, eps, t[None])
        x_prev, pred_x0 = s.step(eps, t, x_t, num_inference_steps=num_steps)
        np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)
        # x_prev equals add_noise(x0, eps, t_prev)
        t_prev = int(t) - 1000 // num_steps
        expect = s.add_noise(x0, eps, jnp.asarray([t_prev]))
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect),
                                   rtol=1e-3, atol=1e-4)

    def test_final_step_returns_pred_x0(self, key):
        """At the last timestep (prev < 0) alpha_prev = final_alpha_cumprod."""
        s = make()
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 3), x0.shape)
        t = jnp.asarray(1)                       # last timestep of 50-step run
        x_t = s.add_noise(x0, eps, t[None])
        x_prev, pred_x0 = s.step(eps, t, x_t, num_inference_steps=50)
        # alpha_prev = acp[0] (≈0.99915): x_prev ≈ √acp0·x0 + √(1−acp0)·eps
        acp0 = float(s.alphas_cumprod[0])
        expect = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x_prev), expect, rtol=1e-3, atol=1e-4)

    def test_jittable_loop(self, key):
        """The whole 10-step denoise under one jit via scan."""
        s = make()
        x = jax.random.normal(key, (1, 4, 8, 8))
        ts = jnp.asarray(s.timesteps(10))

        @jax.jit
        def denoise(x):
            def body(x, t):
                eps = 0.1 * x                     # dummy "model"
                x, _ = s.step(eps, t, x, num_inference_steps=10)
                return x, None
            x, _ = jax.lax.scan(body, x, ts)
            return x

        out = denoise(x)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestExternalGolden:
    """Fixtures from an independent float64 torch transcription of the
    published DDIM equations (scripts/make_ddim_golden.py) — the external
    oracle standing in for diffusers' DDIMScheduler, which the reference
    consumes (stable_diffusion/network.py:26-28) but which is not installed
    here.  A set_timesteps / final-alpha / betas divergence that survives
    the self-consistency tests above fails here."""

    @classmethod
    def setup_class(cls):
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "ddim_golden.npz")
        cls.g = np.load(path)

    def test_alphas_cumprod_table(self):
        s = make()
        # scheduler computes in float64 then casts; the fixture is float64 —
        # agreement must be exact at float32 resolution across all 1000 t
        np.testing.assert_array_equal(
            np.asarray(s.alphas_cumprod),
            self.g["alphas_cumprod"].astype(np.float32))

    def test_final_alpha(self):
        s = make()
        np.testing.assert_array_equal(
            np.float32(s.final_alpha_cumprod),
            self.g["final_alpha_cumprod"].astype(np.float32))

    def test_timestep_table_50(self):
        s = make()
        np.testing.assert_array_equal(s.timesteps(50), self.g["timesteps_50"])

    def test_single_steps_at_probe_timesteps(self):
        """t ∈ {981, 501, 1}: step() matches the float64 oracle to float32
        rounding (our step computes in float32; the tolerance covers only
        the accumulation difference, ~1e-6 relative)."""
        s = make()
        for i, t in enumerate(self.g["probe_ts"]):
            x_t = jnp.asarray(self.g["step_samples"][i], jnp.float32)
            eps = jnp.asarray(self.g["step_model_outputs"][i], jnp.float32)
            x_prev, pred_x0 = s.step(eps, jnp.asarray(int(t)), x_t,
                                     num_inference_steps=50)
            np.testing.assert_allclose(
                np.asarray(x_prev), self.g["step_prev_samples"][i],
                rtol=2e-6, atol=2e-6)
            np.testing.assert_allclose(
                np.asarray(pred_x0), self.g["step_pred_x0"][i],
                rtol=2e-5, atol=2e-5)

    def test_add_noise_at_probe_timesteps(self):
        s = make()
        noisy = s.add_noise(
            jnp.asarray(self.g["add_noise_x0"], jnp.float32),
            jnp.asarray(self.g["add_noise_noise"], jnp.float32),
            jnp.asarray(self.g["probe_ts"]))
        np.testing.assert_allclose(np.asarray(noisy),
                                   self.g["add_noise_noisy"],
                                   rtol=2e-6, atol=2e-6)
