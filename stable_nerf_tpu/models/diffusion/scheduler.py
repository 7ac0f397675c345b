"""DDIM noise scheduler, numerics-parity with diffusers' DDIMScheduler.

The reference loads `DDIMScheduler.from_pretrained(sdxl, "scheduler")`
(reference stable_diffusion/network.py:28) and uses exactly two entry points:
``add_noise`` during training (train.py:91) and ``set_timesteps``/``step``
during the 50-step eta=0 inference loop (train.py:392-404).  This is a pure
functional JAX reimplementation of those paths with the SDXL config
(scaled_linear betas 0.00085→0.012, 1000 train steps, epsilon prediction,
"leading" spacing, steps_offset 1, set_alpha_to_one False).

All state is precomputed host-side into jnp constants; ``add_noise`` and
``step`` are jit-safe with traced timesteps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import SchedulerConfig


class DDIMScheduler(NamedTuple):
    config: SchedulerConfig
    alphas_cumprod: jnp.ndarray        # [T]
    final_alpha_cumprod: jnp.ndarray   # scalar

    @classmethod
    def create(cls, config: Optional[SchedulerConfig] = None) -> "DDIMScheduler":
        config = config or SchedulerConfig()
        T = config.num_train_timesteps
        if config.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5, T)
                ** 2
            )
        elif config.beta_schedule == "linear":
            betas = np.linspace(config.beta_start, config.beta_end, T)
        else:
            raise ValueError(f"unsupported beta_schedule {config.beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if config.set_alpha_to_one else alphas_cumprod[0]
        return cls(
            config=config,
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            final_alpha_cumprod=jnp.float32(final),
        )

    # -- training ----------------------------------------------------------
    def add_noise(self, samples, noise, timesteps):
        """x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε  (diffusers DDIMScheduler.add_noise)."""
        acp = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (samples.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * samples + sqrt_1macp * noise

    def get_velocity(self, samples, noise, timesteps):
        """v = √ᾱ·ε − √(1−ᾱ)·x₀ (for v-prediction training)."""
        acp = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (samples.ndim - 1)
        return (jnp.sqrt(acp).reshape(shape) * noise
                - jnp.sqrt(1.0 - acp).reshape(shape) * samples)

    # -- inference ---------------------------------------------------------
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending timestep sequence with 'leading' spacing + offset
        (diffusers set_timesteps)."""
        c = self.config
        if c.timestep_spacing == "leading":
            ratio = c.num_train_timesteps // num_inference_steps
            ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
            ts = ts.astype(np.int64) + c.steps_offset
        elif c.timestep_spacing == "trailing":
            ratio = c.num_train_timesteps / num_inference_steps
            ts = np.arange(c.num_train_timesteps, 0, -ratio).round() - 1
            ts = ts.astype(np.int64)
        else:
            raise ValueError(f"unsupported timestep_spacing {c.timestep_spacing}")
        return ts

    def step(
        self,
        model_output,
        timestep,
        sample,
        *,
        num_inference_steps: int,
        eta: float = 0.0,
        noise=None,
    ):
        """One DDIM update x_t → x_{t−Δ} (diffusers DDIMScheduler.step, η=0
        default as the reference uses it, train.py:404).

        ``timestep`` may be a traced int array → fully jittable denoise loops
        via lax.fori_loop/scan.
        """
        c = self.config
        prev_timestep = timestep - c.num_train_timesteps // num_inference_steps

        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_prev = jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.clip(prev_timestep, 0)],
            self.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        if c.prediction_type == "epsilon":
            pred_x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t
            )
            pred_eps = model_output
        elif c.prediction_type == "v_prediction":
            pred_x0 = (jnp.sqrt(alpha_prod_t) * sample
                       - jnp.sqrt(beta_prod_t) * model_output)
            pred_eps = (jnp.sqrt(alpha_prod_t) * model_output
                        + jnp.sqrt(beta_prod_t) * sample)
        else:
            raise ValueError(f"unsupported prediction_type {c.prediction_type}")

        if c.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        variance = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * (
            1.0 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * jnp.sqrt(variance)

        dir_xt = jnp.sqrt(1.0 - alpha_prod_prev - std ** 2) * pred_eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * pred_x0 + dir_xt
        if eta > 0:
            if noise is None:
                raise ValueError("eta > 0 requires noise")
            prev_sample = prev_sample + std * noise
        return prev_sample, pred_x0
