"""Windowed SSIM, exact parity with the reference implementation
(loss/losses.py:24-84): 11x11 Gaussian window, sigma 1.5, zero padding,
per-channel (grouped) convolution, C1=0.01^2, C2=0.03^2.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _window(window_size: int, sigma: float):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _filter(img, w2d):
    """Depthwise 2D conv with zero SAME padding; img (H,W,C)."""
    c = img.shape[-1]
    k = w2d.shape[0]
    # depthwise: HWIO with I=1, O=c (feature_group_count=c)
    kernel = jnp.broadcast_to(jnp.asarray(w2d)[:, :, None, None], (k, k, 1, c))
    # NHWC x HWIO
    out = jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over the image; img1/img2 are (H,W,C) in [0,1]."""
    w2d = _window(window_size, sigma)
    mu1 = _filter(img1, w2d)
    mu2 = _filter(img2, w2d)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter(img1 * img1, w2d) - mu1_sq
    sigma2_sq = _filter(img2 * img2, w2d) - mu2_sq
    sigma12 = _filter(img1 * img2, w2d) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
