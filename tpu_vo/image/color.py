"""Color conversion matching cv::cvtColor(BGR2GRAY) bit-for-bit.

The reference converts 3-channel frames to grayscale before detection
(visual_odometry.cpp:105-111). OpenCV's BGR->GRAY uses the BT.601 weights
in 15-bit fixed point with round-half-up:
y = (B*3735 + G*19235 + R*9798 + 16384) >> 15 (verified bit-exact against
cv2 5.0). We reproduce the integer arithmetic exactly so downstream
FAST/Harris thresholds see identical pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_B_COEF = 3735   # 0.114 * 2^15, rounded to make the triple sum 2^15
_G_COEF = 19235  # 0.587 * 2^15
_R_COEF = 9798   # 0.299 * 2^15
_SHIFT = 15


def bgr_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) uint8 BGR -> (..., H, W) uint8 grayscale (cv2-exact)."""
    b = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    r = img[..., 2].astype(jnp.int32)
    y = (b * _B_COEF + g * _G_COEF + r * _R_COEF + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) uint8 RGB -> uint8 grayscale (cv2 RGB2GRAY-exact)."""
    r = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    b = img[..., 2].astype(jnp.int32)
    y = (b * _B_COEF + g * _G_COEF + r * _R_COEF + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)


def ensure_gray(img: jax.Array) -> jax.Array:
    """Pass through 2D images, convert (H, W, 3) BGR like the reference."""
    if img.ndim >= 3 and img.shape[-1] == 3:
        return bgr_to_gray(img)
    return img
