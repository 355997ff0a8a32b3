"""Separable Gaussian blur matching cv::GaussianBlur(ksize=7, sigma=2).

cv::ORB blurs each pyramid level with GaussianBlur((7,7), 2, 2,
BORDER_REFLECT_101) before sampling rBRIEF descriptors. We reproduce the
kernel (cv::getGaussianKernel(7, 2)) and the reflect-101 border exactly;
arithmetic is float32 with a final round, landing within +-1 intensity of
OpenCV's fixed-point path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel: exp(-x^2/(2 sigma^2)) normalized to sum 1."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float64)


def _reflect101_pad(img: jax.Array, pad: int, axis: int) -> jax.Array:
    """BORDER_REFLECT_101: edge pixel not repeated (gfedcb|abcdefgh|gfedcb).

    jnp.pad(mode="reflect") has exactly these semantics and lowers to
    slice+reverse+concat — crucial on TPU, where an index-array take along
    the lane axis lowers to a slow gather.
    """
    width = [(0, 0)] * img.ndim
    width[axis if axis >= 0 else img.ndim + axis] = (pad, pad)
    return jnp.pad(img, width, mode="reflect")


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0,
                  quantize: bool = True) -> jax.Array:
    """Blur (..., H, W) image; float32 output on an integral grid.

    quantize=True rounds the result like OpenCV's uint8 output (the ORB
    descriptor comparisons operate on those integers).
    """
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma), dtype=jnp.float32)
    pad = ksize // 2
    x = img.astype(jnp.float32)

    x = _reflect101_pad(x, pad, axis=-1)
    x = sum(x[..., i:i + img.shape[-1]] * k[i] for i in range(ksize))
    x = _reflect101_pad(x, pad, axis=-2)
    x = sum(x[..., i:i + img.shape[-2], :] * k[i] for i in range(ksize))

    if quantize:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x
