#!/usr/bin/env python
"""Generate external golden fixtures for the DDIM scheduler oracle test.

This is an INDEPENDENT transcription of the published DDIM equations
(Song, Meng, Ermon 2020, eq. 12, with the diffusers timestep-indexing
conventions documented in the DDIMScheduler docstring), written in torch
float64 — deliberately NOT importing `stable_nerf_tpu` so a shared bug
cannot cancel out. The reference pipeline consumes the scheduler through
diffusers (`/root/reference/stable_diffusion/network.py:26-28`,
`train.py:91,392-404`); diffusers is not installed in this environment,
so these fixtures stand in as the external oracle (VERDICT r2, next #8).

Conventions exercised (SDXL base `scheduler_config.json`):
  * betas: scaled_linear — linspace between sqrt(beta_start), sqrt(beta_end)
    then squared; T=1000, beta_start=0.00085, beta_end=0.012
  * alphas_cumprod = cumprod(1 - betas)
  * set_alpha_to_one=False → final_alpha_cumprod = alphas_cumprod[0]
  * set_timesteps "leading": t_i = round(i * (T // n)) descending, + offset 1
  * step (eta=0, epsilon prediction, no clip_sample):
      prev_t  = t - T // n
      x0_hat  = (x_t - sqrt(1-a_t) eps) / sqrt(a_t)
      x_prev  = sqrt(a_prev) x0_hat + sqrt(1 - a_prev) eps
    with a_prev = alphas_cumprod[prev_t] if prev_t >= 0 else final_alpha.

Writes tests/fixtures/ddim_golden.npz. Run once; the fixture is committed.
"""

import os

import numpy as np
import torch

T = 1000
BETA_START = 0.00085
BETA_END = 0.012
N_INFER = 50


def main():
    torch.manual_seed(0)

    betas = (
        torch.linspace(BETA_START ** 0.5, BETA_END ** 0.5, T,
                       dtype=torch.float64) ** 2
    )
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    final_alpha = alphas_cumprod[0].clone()   # set_alpha_to_one = False

    # "leading" spacing with steps_offset=1 (SDXL base config)
    ratio = T // N_INFER
    timesteps = (torch.arange(N_INFER, dtype=torch.float64) * ratio).round()
    timesteps = timesteps.flip(0).to(torch.int64) + 1

    # single-step input→output triples at t ∈ {981, 501, 1}
    probe_ts = [981, 501, 1]
    samples, model_outputs, prev_samples, pred_x0s = [], [], [], []
    gen = torch.Generator().manual_seed(1234)
    for t in probe_ts:
        x_t = torch.randn((1, 4, 8, 8), generator=gen, dtype=torch.float64)
        eps = torch.randn((1, 4, 8, 8), generator=gen, dtype=torch.float64)
        prev_t = t - ratio
        a_t = alphas_cumprod[t]
        a_prev = alphas_cumprod[prev_t] if prev_t >= 0 else final_alpha
        x0_hat = (x_t - torch.sqrt(1.0 - a_t) * eps) / torch.sqrt(a_t)
        x_prev = torch.sqrt(a_prev) * x0_hat + torch.sqrt(1.0 - a_prev) * eps
        samples.append(x_t.numpy())
        model_outputs.append(eps.numpy())
        prev_samples.append(x_prev.numpy())
        pred_x0s.append(x0_hat.numpy())

    # add_noise triples at the same probe timesteps
    an_x0 = torch.randn((3, 4, 8, 8), generator=gen, dtype=torch.float64)
    an_noise = torch.randn((3, 4, 8, 8), generator=gen, dtype=torch.float64)
    a = alphas_cumprod[torch.tensor(probe_ts)].reshape(-1, 1, 1, 1)
    an_noisy = torch.sqrt(a) * an_x0 + torch.sqrt(1.0 - a) * an_noise

    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "tests", "fixtures", "ddim_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        alphas_cumprod=alphas_cumprod.numpy(),
        final_alpha_cumprod=final_alpha.numpy(),
        timesteps_50=timesteps.numpy(),
        probe_ts=np.asarray(probe_ts, np.int64),
        step_samples=np.stack(samples),
        step_model_outputs=np.stack(model_outputs),
        step_prev_samples=np.stack(prev_samples),
        step_pred_x0=np.stack(pred_x0s),
        add_noise_x0=an_x0.numpy(),
        add_noise_noise=an_noise.numpy(),
        add_noise_noisy=an_noisy.numpy(),
    )
    print(f"wrote {os.path.normpath(out)}")
    print("alphas_cumprod[0,499,999] =",
          alphas_cumprod[0].item(), alphas_cumprod[499].item(),
          alphas_cumprod[999].item())
    print("timesteps_50 head/tail:", timesteps[:3].tolist(),
          timesteps[-3:].tolist())


if __name__ == "__main__":
    main()
