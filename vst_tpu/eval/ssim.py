"""SSIM metric (parity: AdaAttN/eval.py:167-223 ``SSIMMetric``).

Gaussian window (size 11, σ 1.5) depthwise convolution with zero padding,
C1=0.01², C2=0.03².  Note the reference evaluates on 0–255 tensors with
[0,1]-range constants (eval.py:224-236); we accept whatever range the caller
supplies, mirroring that behavior.
"""

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    g1 = np.linspace(-(window_size // 2), window_size // 2, window_size)
    g = np.exp(-(g1 ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    k2 = np.outer(g, g).astype(np.float32)
    return k2


def _depthwise_blur(x, kernel, pad):
    c = x.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]
    k = jnp.broadcast_to(k, kernel.shape + (1, c)).astype(jnp.float32)
    return lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, reduction: str = "mean"):
    """img1/img2: (N, H, W, C).  Returns scalar (mean) or per-image vector."""
    assert img1.shape == img2.shape and img1.ndim == 4
    pad = window_size // 2
    kern = _gaussian_kernel(window_size, sigma)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1 = _depthwise_blur(x, kern, pad)
    mu2 = _depthwise_blur(y, kern, pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(x * x, kern, pad) - mu1_sq
    sigma2_sq = _depthwise_blur(y * y, kern, pad) - mu2_sq
    sigma12 = _depthwise_blur(x * y, kern, pad) - mu1_mu2

    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    ssim_map = num / den
    per_image = jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(per_image) if reduction == "mean" else per_image
