"""Image losses: L1, L2, windowed SSIM, PSNR, and the 3D-GS combined loss.

Semantics match the reference (`/root/reference/utils/loss_utils.py:18-85`,
`utils/image_utils.py:15-21`): SSIM uses an 11x11 Gaussian window (sigma=1.5),
C1=0.01^2, C2=0.03^2, zero 'same' padding, per-channel depthwise convolution,
mean over all pixels/channels. Implemented with `lax.conv_general_dilated`
(grouped conv) so it fuses into a handful of XLA convs on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak SNR over the whole image batch, peak=1.0 (`image_utils.py:19`)."""
    m = mse(pred, target)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-20)))


@functools.lru_cache(maxsize=4)
def _gaussian_taps(window_size: int, sigma: float):
    import numpy as np

    xs = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return tuple((g / g.sum()).astype(np.float32).tolist())


def _separable_blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """[C, H, W] -> same-shape Gaussian blur with zero 'same' padding.

    The 11x11 window is an outer product, so two shift-and-add passes of 11
    taps replace the 121-tap grouped conv (which has terrible MXU utilization
    at 3 channels) — pure fused VPU work, ~10x faster on TPU.
    """
    taps = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    _, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)))
    x = sum(t * xp[:, :, i:i + w] for i, t in enumerate(taps))
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
    return sum(t * xp[:, i:i + h, :] for i, t in enumerate(taps))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a [C, H, W] image pair (`loss_utils.py:26-85`)."""
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    blurred = _separable_blur(stacked, window_size, sigma)
    mu1, mu2, s11, s22, s12 = (blurred[i * c:(i + 1) * c] for i in range(5))
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = s11 - mu1_sq
    sigma2_sq = s22 - mu2_sq
    sigma12 = s12 - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def gs_loss(pred: jnp.ndarray, target: jnp.ndarray, lambda_dssim: float = 0.2) -> jnp.ndarray:
    """The 3D-GS training loss: (1-l)*L1 + l*(1 - SSIM)
    (`train_densify_prune.py:135-138`)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
