"""Harris corner response for ORB keypoint ranking.

Replicates HarrisResponses from OpenCV's orb.cpp (the reference selects
HARRIS_SCORE, visual_odometry.cpp:71): 3x3 Sobel derivatives, structure
tensor summed over a 7x7 block centered on the keypoint, response
(a*b - c^2 - k*(a+b)^2) * scale^4 with k=0.04 and scale = 1/(4*7*255).

Computed as dense maps (two Sobel stencils + separable 7x7 box sums) and
gathered at keypoint locations — the dense form fuses into a handful of
vectorized passes on TPU instead of OpenCV's per-keypoint block loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HARRIS_K = 0.04
BLOCK_SIZE = 7


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    return jnp.roll(img, (-dy, -dx), axis=(-2, -1))


def sobel_derivatives(img: jax.Array):
    """OpenCV orb.cpp derivative stencils (unnormalized 3x3 Sobel)."""
    Ix = (
        (_shift(img, 0, 1) - _shift(img, 0, -1)) * 2.0
        + (_shift(img, -1, 1) - _shift(img, -1, -1))
        + (_shift(img, 1, 1) - _shift(img, 1, -1))
    )
    Iy = (
        (_shift(img, 1, 0) - _shift(img, -1, 0)) * 2.0
        + (_shift(img, 1, -1) - _shift(img, -1, -1))
        + (_shift(img, 1, 1) - _shift(img, -1, 1))
    )
    return Ix, Iy


def _box_sum(img: jax.Array, radius: int) -> jax.Array:
    """Separable (2r+1)^2 box sum via shifted adds (no normalization)."""
    acc = img
    for d in range(1, radius + 1):
        acc = acc + _shift(img, 0, d) + _shift(img, 0, -d)
    out = acc
    for d in range(1, radius + 1):
        out = out + _shift(acc, d, 0) + _shift(acc, -d, 0)
    return out


def harris_response_map(img: jax.Array, block_size: int = BLOCK_SIZE,
                        k: float = HARRIS_K) -> jax.Array:
    """Dense Harris response; valid where the 7x7+Sobel support is interior."""
    Ix, Iy = sobel_derivatives(img)
    r = block_size // 2
    a = _box_sum(Ix * Ix, r)
    b = _box_sum(Iy * Iy, r)
    c = _box_sum(Ix * Iy, r)
    scale = 1.0 / ((1 << 2) * block_size * 255.0)
    scale_sq_sq = scale ** 4
    return (a * b - c * c - k * (a + b) * (a + b)) * scale_sq_sq


def harris_at(img: jax.Array, ys: jax.Array, xs: jax.Array,
              block_size: int = BLOCK_SIZE, k: float = HARRIS_K) -> jax.Array:
    """Harris response sampled at integer keypoint locations."""
    rmap = harris_response_map(img, block_size, k)
    return rmap[..., ys, xs]
