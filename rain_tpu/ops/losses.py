"""Training losses and image metrics: L1, SSIM, PSNR.

Matches the reference formulas exactly:
- l1: mean absolute error                      (utils/loss_utils.py:6)
- ssim: 11x11 Gaussian window, sigma 1.5, SAME padding, per-channel
  depthwise convolution, C1=0.01², C2=0.03²    (utils/loss_utils.py:12-52)
- psnr: 20·log10(1/sqrt(mse)) per image        (utils/image_utils.py:6-8)
- training loss: (1-λ)·L1 + λ·(1-SSIM), λ=0.2  (train.py:114)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x, y):
    return jnp.abs(x - y).mean()


def l2_loss(x, y):
    return ((x - y) ** 2).mean()


@functools.lru_cache()
def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    g = np.array([math.exp(-(i - window_size // 2) ** 2 /
                           (2 * sigma ** 2)) for i in range(window_size)])
    g = g / g.sum()
    w2 = np.outer(g, g).astype(np.float32)
    return w2


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """SSIM over [C, H, W] (or [N, C, H, W]) images, mean-reduced."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    c = img1.shape[1]
    w2 = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.broadcast_to(w2, (c, 1, window_size, window_size))
    pad = window_size // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) /
                ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return ssim_map.mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray):
    """Per-image PSNR; img [C, H, W] or [N, C, H, W] in [0, 1]."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    mse = ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(axis=1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def training_loss(image, gt, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM)  (train.py:113-114). Returns (loss, l1)."""
    ll1 = l1_loss(image, gt)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt))
    return loss, ll1
