"""Losses and image metrics (reference utils/loss_utils.py:5-27)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import ssim as _ssim


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def mse_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def mse(img1, img2):
    """Per-image MSE, [B, ...] → [B, 1] (reference loss_utils.py:21-22)."""
    d = (img1 - img2) ** 2
    return jnp.mean(d.reshape(d.shape[0], -1), axis=1, keepdims=True)


def psnr(img1, img2):
    """Per-image PSNR = 20·log10(1/√mse) (reference loss_utils.py:25-27)."""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def ssim(pred, gt):
    """Mean SSIM, NCHW (reference loss_utils.py:5-6 → fused_ssim)."""
    return _ssim(pred, gt)
