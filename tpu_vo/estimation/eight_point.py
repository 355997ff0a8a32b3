"""Masked, batched normalized 8-point essential/fundamental estimation.

TPU-native equivalent of the linear estimator OpenCV uses to seed/refine
two-view geometry (the reference's cv::findEssentialMat at
visual_odometry.cpp:213-216 uses the 5-point minimal solver; the 8-point
path here serves (a) RANSAC with 8-point minimal samples, and (b) the
inlier refit polish after RANSAC).

Everything is fixed-shape: correspondences arrive as (..., N, 2) arrays with
a boolean validity mask, and the nullspace is extracted from the 9x9 normal
matrix A^T A by symmetric eigendecomposition — batched `eigh` on small
matrices maps far better onto TPU than per-sample SVD of ragged (n, 9)
systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _constraint_rows(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Epipolar constraint rows a_i with a_i . vec(E) = x2_i^T E x1_i.

    x1, x2: (..., N, 2). Returns (..., N, 9) with vec(E) row-major.
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def normalize_for_conditioning(x: jax.Array, mask: jax.Array):
    """Hartley normalization: zero-mean, mean distance sqrt(2).

    Returns (x_norm, T) with T the (..., 3, 3) similarity so that
    x_norm_h = T @ x_h. Masked points do not influence the statistics.
    """
    m = mask[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    mean = jnp.sum(x * m, axis=-2) / cnt
    centered = (x - mean[..., None, :]) * m
    dist = jnp.linalg.norm(centered, axis=-1)
    mean_dist = jnp.sum(dist, axis=-1) / jnp.maximum(cnt[..., 0], 1.0)
    scale = jnp.sqrt(jnp.asarray(2.0, x.dtype)) / jnp.maximum(mean_dist, 1e-12)
    x_norm = (x - mean[..., None, :]) * scale[..., None, None]

    zero = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, zero, -scale * mean[..., 0]], axis=-1),
            jnp.stack([zero, scale, -scale * mean[..., 1]], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return x_norm, T


def fit_fundamental_linear(x1: jax.Array, x2: jax.Array,
                           mask: jax.Array) -> jax.Array:
    """Least-squares 3x3 matrix G minimizing sum of (x2^T G x1)^2.

    Uses Hartley-normalized coordinates internally and denormalizes
    G = T2^T G_hat T1. No rank/essential projection is applied here.
    """
    x1n, T1 = normalize_for_conditioning(x1, mask)
    x2n, T2 = normalize_for_conditioning(x2, mask)
    A = _constraint_rows(x1n, x2n) * mask[..., None].astype(x1.dtype)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    g = vecs[..., :, 0]
    G = g.reshape(*g.shape[:-1], 3, 3)
    G = jnp.swapaxes(T2, -1, -2) @ G @ T1
    return G


def project_to_essential(G: jax.Array) -> jax.Array:
    """Nearest essential matrix: SVD with singular values -> (1, 1, 0).

    The result is scale-normalized (||E||_F = sqrt(2)), which is the
    convention RANSAC scoring and decomposition assume.
    """
    U, s, Vt = jnp.linalg.svd(G)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return (U * d[..., None, :]) @ Vt


def estimate_essential_8pt(x1: jax.Array, x2: jax.Array,
                           mask: jax.Array) -> jax.Array:
    """Normalized 8-point essential estimate from masked correspondences.

    x1/x2 are normalized camera coordinates (..., N, 2); N >= 8 of them
    should be valid. Returns (..., 3, 3) essential matrices.
    """
    return project_to_essential(fit_fundamental_linear(x1, x2, mask))
