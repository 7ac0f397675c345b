"""stable_nerf_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of Stable-NeRF.

A from-scratch framework with the capabilities of earslan25/Stable-NeRF:
generalizable novel-view synthesis training a NeRF in the latent space of
Stable Diffusion XL, conditioning the frozen SDXL U-Net through an
IP-Adapter on NeRF-rendered latents plus per-pixel ray directions.

Layer map (mirrors SURVEY.md §1 of the reference, redesigned TPU-first):
  ops/        fixed-shape ray marching, compositing (custom_vjp), hash/SH/freq
              encodings, morton/packbits utilities, SSIM — jnp + Pallas kernels
  models/nerf NeRF network (hash enc + MLPs), occupancy-grid renderer
  models/diffusion  SDXL VAE + U-Net + CLIP text, DDIM scheduler, IP-Adapter
  data/       ray generation, dataset loading/preprocessing, device prefetch
  parallel/   jax.sharding Mesh / shard_map data-parallel training
  training/   joint Stable-NeRF train step, loops, orbax checkpointing
  utils/      losses/PSNR/SSIM, visualization, profiling
"""

__version__ = "0.1.0"
