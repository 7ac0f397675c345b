"""SSIM metric via separable Gaussian depthwise convolution.

TPU-native equivalent of the reference's `fused-ssim` CUDA extension
(reference utils/loss_utils.py:2-6): standard SSIM with an 11×11 Gaussian
window (sigma 1.5), C1=0.01², C2=0.03², mean-reduced.  XLA fuses the
separable convolutions; no custom kernel is warranted at this size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(img, kernel):
    """Separable depthwise Gaussian blur, NCHW, 'same' padding.

    precision=HIGHEST: TPU f32 convs default to bf16 multiplies, whose
    ~1e-2 relative noise survives the ``blur(x²) − mu²`` cancellation in
    the variance estimate — near-constant regions then read sigma² < 0
    and SSIM > 1 (observed 1.167 on the demo's white-background renders;
    the same pair reads 0.951 on the exact-f32 CPU path).  The window is
    11 taps — exactness costs nothing here."""
    n, c, h, w = img.shape
    k = kernel.shape[0]
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    x = img.reshape(n * c, 1, h, w)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [((k - 1) // 2, (k - 1) // 2), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), ((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return x.reshape(n, c, h, w)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over a batch; images [N, C, H, W] in [0, 1]."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    kernel = _gaussian_kernel(window_size, sigma)
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    mu1 = _blur(img1, kernel)
    mu2 = _blur(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # clamp: true variances are nonnegative; tiny negative values are
    # pure cancellation noise (covariance may legitimately be negative)
    sigma1_sq = jnp.maximum(_blur(img1 * img1, kernel) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_blur(img2 * img2, kernel) - mu2_sq, 0.0)
    sigma12 = _blur(img1 * img2, kernel) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    # mean over the VALID interior only: the zero-padded borders bias the
    # window moments (variances can go negative there), which pushed the
    # reported SSIM above 1.0 on near-constant images (observed 1.04 on
    # the round-5 demo's white-background renders).  Standard SSIM crops
    # the half-window border.
    b = (window_size - 1) // 2
    if ssim_map.shape[-1] > 2 * b and ssim_map.shape[-2] > 2 * b:
        ssim_map = ssim_map[..., b:-b, b:-b]
    return jnp.mean(ssim_map)
