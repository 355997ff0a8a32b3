"""Epipolar algebra: E/F construction, conversions, residuals.

Conventions (geometry_conventions.h, visual_odometry.cpp:224-263):
  - correspondences satisfy x2^T F x1 = 0 in 0-based pixels,
  - E = [t]_x R acts on normalized coordinates x_hat = K^{-1} x,
  - F = K^{-T} E K^{-1}.
The epipolar-viewer 0-based <-> 1-based conversions and Frobenius
normalization mirror epipolar_viewer.h:36-62.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_vo.geometry.camera import homogenize, invert_intrinsics
from tpu_vo.geometry.se3 import skew


def essential_from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """E = [t]_x R for relative motion x2 = R x1 + t."""
    return skew(t) @ R


def fundamental_from_essential(E: jax.Array, K: jax.Array) -> jax.Array:
    """F = K^{-T} E K^{-1} (visual_odometry.cpp:224-232)."""
    Kinv = invert_intrinsics(K)
    return jnp.swapaxes(Kinv, -1, -2) @ E @ Kinv


def essential_from_fundamental(F: jax.Array, K: jax.Array) -> jax.Array:
    """E = K^T F K."""
    return jnp.swapaxes(K, -1, -2) @ F @ K


def algebraic_residual(F: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """|x2^T F x1| per correspondence; x1/x2 are (..., N, 2) pixels.

    The reference prints the inlier mean of this quantity
    (visual_odometry.cpp:248-263).
    """
    h1 = homogenize(x1)
    h2 = homogenize(x2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, h1)
    return jnp.abs(jnp.einsum("...ni,...ni->...n", h2, Fx1))


def epipolar_line(F: jax.Array, x1: jax.Array) -> jax.Array:
    """l2 = F x1 for points (..., N, 2); returns (..., N, 3) line coeffs."""
    return jnp.einsum("...ij,...nj->...ni", F, homogenize(x1))


def point_line_distance(line: jax.Array, x: jax.Array) -> jax.Array:
    """Perpendicular pixel distance from (..., N, 2) points to (..., N, 3)
    lines (visual_odometry.cpp:17-22)."""
    a, b, c = line[..., 0], line[..., 1], line[..., 2]
    num = jnp.abs(a * x[..., 0] + b * x[..., 1] + c)
    den = jnp.sqrt(a * a + b * b)
    return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), jnp.inf)


def sampson_error(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) error of x2^T E x1 = 0.

    x1/x2 are (..., N, 2) in whatever coordinates E lives in (normalized for
    an essential matrix). This is the inlier score used by the RANSAC loop,
    matching the scoring OpenCV's 5-point RANSAC applies in normalized
    coordinates.
    """
    h1 = homogenize(x1)
    h2 = homogenize(x2)
    Ex1 = jnp.einsum("...ij,...nj->...ni", E, h1)
    Etx2 = jnp.einsum("...ji,...nj->...ni", E, h2)
    x2Ex1 = jnp.einsum("...ni,...ni->...n", h2, Ex1)
    denom = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
        + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return (x2Ex1 * x2Ex1) / jnp.maximum(denom, 1e-18)


def normalize_frobenius(F: jax.Array) -> jax.Array:
    """Scale F to unit Frobenius norm (epipolar_viewer.h:53-62)."""
    n = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return jnp.where(n > 0.0, F / jnp.maximum(n, 1e-30), F)


def one_based_shift_matrix(dtype=jnp.float64) -> jax.Array:
    """T mapping 0-based pixel coords to 1-based (epipolar_viewer.h:36-40)."""
    return jnp.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]],
                       dtype=dtype)


def convert_F_0based_to_1based(F0: jax.Array) -> jax.Array:
    """F1 = T^{-T} F0 T^{-1} (epipolar_viewer.h:42-46)."""
    T = one_based_shift_matrix(F0.dtype)
    Tinv = jnp.linalg.inv(T)
    return jnp.swapaxes(Tinv, -1, -2) @ F0 @ Tinv


def convert_F_1based_to_0based(F1: jax.Array) -> jax.Array:
    """F0 = T^T F1 T (epipolar_viewer.h:48-51)."""
    T = one_based_shift_matrix(F1.dtype)
    return jnp.swapaxes(T, -1, -2) @ F1 @ T
