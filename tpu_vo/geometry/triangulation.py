"""Batched linear (DLT) triangulation and cheirality tests.

Replicates the geometry inside cv::recoverPose (invoked at
visual_odometry.cpp:268): triangulate correspondences under P0 = K[I|0],
P1 = K[R|t], then count points with positive, bounded depth in both views.
Implemented with a batched 4x4 symmetric eigendecomposition (A^T A) instead
of per-point SVD loops — `eigh` on stacked 4x4s maps cleanly onto TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_vo.geometry.camera import homogenize


def projection_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """P = [R | t] of shape (..., 3, 4) (camera extrinsic form)."""
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def triangulate_dlt(P0: jax.Array, P1: jax.Array, x1: jax.Array,
                    x2: jax.Array) -> jax.Array:
    """Linear triangulation of (..., N, 2) correspondences.

    Builds the standard DLT system per point
        [x1 * P0[2] - P0[0]; y1 * P0[2] - P0[1];
         x2 * P1[2] - P1[0]; y2 * P1[2] - P1[1]]
    and takes the null vector via eigh(A^T A). Returns homogeneous world
    points (..., N, 4), un-normalized (caller dehomogenizes).
    """
    def rows(P, x):
        # P: (..., 3, 4), x: (..., N, 2) -> (..., N, 2, 4)
        P = P[..., None, :, :]
        r0 = x[..., 0:1, None] * P[..., 2, :][..., None, :] - P[..., 0, :][..., None, :]
        r1 = x[..., 1:2, None] * P[..., 2, :][..., None, :] - P[..., 1, :][..., None, :]
        return jnp.concatenate([r0, r1], axis=-2)

    A = jnp.concatenate([rows(P0, x1), rows(P1, x2)], axis=-2)  # (..., N, 4, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    # Smallest-eigenvalue eigenvector of a symmetric 4x4 = DLT null vector.
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def cheirality_mask(R: jax.Array, t: jax.Array, x1: jax.Array, x2: jax.Array,
                    distance_thresh: float = 50.0,
                    method: str = "midpoint") -> jax.Array:
    """Boolean mask of points in front of both cameras and within depth bound.

    x1/x2 are normalized camera coordinates (..., N, 2). Mirrors
    cv::recoverPose's test: depth > 0 in camera 1, depth < distance_thresh,
    and the same in camera 2 after applying [R|t].

    method="midpoint" (default, TPU fast path): closed-form ray depth from
    the cross-product identity z1 (x2 x R x1) = -(x2 x t); a handful of
    fused elementwise ops. method="dlt" replicates cv::recoverPose's DLT
    triangulation exactly (batched 4x4 eigendecomposition — slower; used
    by parity tests). The two agree except for points near the depth
    cutoff under noise.
    """
    if method == "midpoint":
        h1 = homogenize(x1)
        h2 = homogenize(x2)
        Rx1 = jnp.einsum("...ij,...nj->...ni", R, h1)
        a = jnp.cross(h2, Rx1)                       # x2 x R x1
        b = jnp.cross(h2, jnp.broadcast_to(t[..., None, :], h2.shape))
        denom = jnp.sum(a * a, axis=-1)
        z1 = -jnp.sum(a * b, axis=-1) / jnp.maximum(denom, 1e-18)
        z2 = z1 * Rx1[..., 2] + t[..., None, 2]
        ok = (z1 > 0) & (z1 < distance_thresh)
        ok &= (z2 > 0) & (z2 < distance_thresh)
        ok &= denom > 1e-18
        return ok

    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    zeros = jnp.zeros_like(t)
    P0 = projection_matrix(eye, zeros)
    P1 = projection_matrix(R, t)
    Q = triangulate_dlt(P0, P1, x1, x2)  # (..., N, 4) homogeneous

    z1w = Q[..., 2] * Q[..., 3]
    ok = z1w > 0
    w_safe = jnp.where(jnp.abs(Q[..., 3]) > 1e-12, Q[..., 3], 1e-12)
    z1 = Q[..., 2] / w_safe
    ok &= z1 < distance_thresh

    Q_eucl = Q[..., :3] / w_safe[..., None]
    pc2 = jnp.einsum("...ij,...nj->...ni", R, Q_eucl) + t[..., None, :]
    ok &= pc2[..., 2] > 0
    ok &= pc2[..., 2] < distance_thresh
    return ok


def depths_in_both_views(R: jax.Array, t: jax.Array, x1: jax.Array,
                         x2: jax.Array):
    """Return (z1, z2) depths of triangulated points for diagnostics."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    P0 = projection_matrix(eye, jnp.zeros_like(t))
    P1 = projection_matrix(R, t)
    Q = triangulate_dlt(P0, P1, x1, x2)
    w_safe = jnp.where(jnp.abs(Q[..., 3]) > 1e-12, Q[..., 3], 1e-12)
    X = Q[..., :3] / w_safe[..., None]
    z1 = X[..., 2]
    z2 = (jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :])[..., 2]
    return z1, z2


def reprojection_error(P: jax.Array, X: jax.Array, x: jax.Array) -> jax.Array:
    """Pixel reprojection error of world points X (..., N, 3) through P.

    P is a (..., 3, 4) projection (including K if x is in pixels).
    """
    Xh = homogenize(X)
    proj = jnp.einsum("...ij,...nj->...ni", P, Xh)
    z = jnp.where(jnp.abs(proj[..., 2]) > 1e-12, proj[..., 2], 1e-12)
    uv = proj[..., :2] / z[..., None]
    return jnp.linalg.norm(uv - x, axis=-1)
