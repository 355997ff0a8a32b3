"""Pinhole intrinsics utilities.

The reference derives K from image size: fx = fy = W, cx = W/2, cy = H/2
(visual_odometry.cpp:90-98). Points are 0-based pixel coordinates treated as
homogeneous x = [u, v, 1]^T (geometry_conventions.h:6-12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def intrinsics_from_image_size(width: int, height: int,
                               dtype=jnp.float32) -> jax.Array:
    """K = [[W,0,W/2],[0,W,H/2],[0,0,1]] per visual_odometry.cpp:90-98."""
    w = float(width)
    h = float(height)
    return jnp.asarray(
        [[w, 0.0, w / 2.0], [0.0, w, h / 2.0], [0.0, 0.0, 1.0]], dtype=dtype
    )


def intrinsics(fx, fy, cx, cy, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype
    )


def invert_intrinsics(K: jax.Array) -> jax.Array:
    """Closed-form inverse of an upper-triangular pinhole K."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    s = K[..., 0, 1]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)],
                     axis=-1)
    row1 = jnp.stack([zero, 1.0 / fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize_points(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel (..., 2) -> normalized camera coordinates x_hat = K^{-1} x."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = (pts[..., 0] - cx) / fx
    v = (pts[..., 1] - cy) / fy
    return jnp.stack([u, v], axis=-1)


def denormalize_points(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Normalized camera coords (..., 2) -> pixels."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = pts[..., 0] * fx + cx
    v = pts[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def homogenize(pts: jax.Array) -> jax.Array:
    """(..., 2) -> (..., 3) homogeneous with trailing 1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def project(pts_c: jax.Array, K: jax.Array) -> jax.Array:
    """Camera-frame 3D points (..., 3) -> pixel coordinates (..., 2)."""
    z = pts_c[..., 2:3]
    xy = pts_c[..., :2] / z
    return denormalize_points(xy, K)
