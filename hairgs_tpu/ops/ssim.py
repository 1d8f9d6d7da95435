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


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int, sigma: float):
    """(n, n) banded matrix applying the 1D Gaussian with zero SAME padding
    (rows near the edge truncate the kernel — exactly torch's zero-pad
    conv). Symmetric since the Gaussian is."""
    g = _window(window_size, sigma)
    pad = window_size // 2
    a = np.zeros((n, n), np.float32)
    i = np.arange(n)
    for o, wgt in enumerate(g):
        j = i + (o - pad)
        ok = (j >= 0) & (j < n)
        a[i[ok], j[ok]] = wgt
    return a


def _filter(img, g1d, window_size: int = 11, sigma: float = 1.5):
    """Separable Gaussian blur as two banded MATMULS; img (H,W,C).

    The reference's 2D window is the outer product of a 1D Gaussian with
    itself (loss/losses.py:34-40), so two 1D passes compute the identical
    filter. Depthwise convolutions don't map onto the TPU MXU (they lower
    to vector ops and dominated the loss cost); a banded (H,H) / (W,W)
    matmul is the same linear operator and runs at matrix-unit speed."""
    del g1d  # kept in the signature for compatibility; bands encode it
    h, w, _ = img.shape
    ah = jnp.asarray(_band_matrix(h, window_size, sigma))
    aw = jnp.asarray(_band_matrix(w, window_size, sigma))
    x = jnp.einsum("ih,hwc->iwc", ah, img,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("jw,hwc->hjc", aw, x,
                      precision=jax.lax.Precision.HIGHEST)


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
