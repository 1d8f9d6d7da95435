"""Windowed SSIM, exact parity with the reference implementation
(loss/losses.py:24-84): 11x11 Gaussian window, sigma 1.5, zero padding,
per-channel (grouped) convolution, C1=0.01^2, C2=0.03^2.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _window(window_size: int, sigma: float):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g = (g / g.sum()).astype(np.float32)
    return g


def _filter(img, g1d):
    """Depthwise Gaussian blur with zero SAME padding; img (H,W,C).

    The reference's 2D window is the outer product of a 1D Gaussian with
    itself (loss/losses.py:34-40), so two 1D passes compute the identical
    filter at ~1/5 of the work."""
    c = img.shape[-1]
    k = g1d.shape[0]
    pad = k // 2
    kern = jnp.asarray(g1d)

    def dw_conv(x, kernel_hw):
        kh, kw = kernel_hw.shape
        kernel = jnp.broadcast_to(kernel_hw[:, :, None, None], (kh, kw, 1, c))
        return jax.lax.conv_general_dilated(
            x[None], kernel, window_strides=(1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )[0]

    out = dw_conv(img, kern[:, None])  # vertical pass (k,1)
    return dw_conv(out, kern[None, :])  # horizontal pass (1,k)


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
