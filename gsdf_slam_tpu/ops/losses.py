"""Photometric losses: L1, PSNR, SSIM, and the mapper's training loss.

Equivalents of include/loss_utils.h (l1_loss :28-31, psnr :33-47, SSIM via
11x11 sigma-1.5 Gaussian window and grouped conv :49-124) and the loss
assembly of gaussian_mapper.cpp:415-429 — including its quirk of comparing
masked render against the *unmasked* gt inside SSIM.

Images are HWC float32 in [0,1]. The SSIM convs use zero padding (torch
conv2d default) and run as one grouped XLA convolution at full precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cached as numpy: caching a jnp array can leak tracers across jit scopes
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma)).astype(np.float32)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _gaussian_taps(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma)).astype(np.float32)
    return g / g.sum()


def _filter(img: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Separable Gaussian filter with zero padding. img [H, W, C].

    The 2D window is an outer product of one 1D Gaussian, so zero-padded
    separable filtering is exactly the reference's grouped conv2d
    (loss_utils.h:85-97). Implemented as 11-tap shift-adds per axis — a
    3-channel grouped convolution pads channels to the TPU's native 128
    lanes and runs ~25x slower than this pure-VPU form.
    """
    taps = _gaussian_taps(window_size)
    pad = window_size // 2
    h, w = img.shape[0], img.shape[1]

    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)))
    out = taps[0] * x[0:h]
    for k in range(1, window_size):
        out = out + taps[k] * x[k : k + h]
    x = jnp.pad(out, ((0, 0), (pad, pad), (0, 0)))
    out = taps[0] * x[:, 0:w]
    for k in range(1, window_size):
        out = out + taps[k] * x[:, k : k + w]
    return out


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """10*log10(1/mse) (loss_utils.h:33-37)."""
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_gaussian_splatting(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-leading-dim PSNR then mean, 20*log10(1/sqrt(mse))
    (loss_utils.h:43-47)."""
    d = (a - b).reshape(a.shape[0], -1)
    mse = jnp.mean(d * d, axis=1)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM map, exactly as loss_utils.h:76-124."""
    mu1 = _filter(img1, window_size)
    mu2 = _filter(img2, window_size)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _filter(img2 * img2, window_size) - mu2_sq
    sigma12 = _filter(img1 * img2, window_size) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    return jnp.mean(ssim_map)


def mapper_loss(
    rendered: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray | None,
    lambda_dssim: float | jnp.ndarray = 0.2,
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM), gaussian_mapper.cpp:415-429.

    Undistortion black edges are replaced with white in BOTH images for L1
    (:415-417), but the SSIM term deliberately compares the masked render
    against the unmasked gt — a reference quirk kept for parity (:429).
    """
    if mask is not None:
        m = mask[..., None] > 0 if mask.ndim == 2 else mask > 0
        masked_img = jnp.where(m, rendered, 1.0)
        masked_gt = jnp.where(m, gt, 1.0)
    else:
        masked_img, masked_gt = rendered, gt
    ll1 = l1_loss(masked_img, masked_gt)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(masked_img, gt))
