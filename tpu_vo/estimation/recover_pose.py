"""Pose recovery from an essential matrix with cheirality disambiguation.

TPU-native equivalent of cv::recoverPose (invoked at
visual_odometry.cpp:268): decompose E into the four (R, t) candidates,
triangulate the masked correspondences under each, count points with
positive bounded depth in both views, and return the winner plus its
updated inlier mask and count. All four candidates are evaluated as one
stacked batch — no host-side branching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_vo.geometry.triangulation import cheirality_mask


class RecoveredPose(NamedTuple):
    R: jax.Array           # (..., 3, 3) rotation, x_c2 = R x_c1 + t
    t: jax.Array           # (..., 3) unit translation
    mask: jax.Array        # (..., N) bool: input inliers passing cheirality
    num_valid: jax.Array   # (...,) int32 count of mask


def decompose_essential(E: jax.Array):
    """E -> (R1, R2, t) candidates via SVD (MVG2e 9.6.2 / cv::decomposeEssentialMat).

    Returns rotations with det(+1) and a unit t; the four candidate motions
    are (R1, +-t), (R2, +-t).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Force proper rotations: flip the last column/row by the determinant.
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U.at[..., :, 2].multiply(jnp.sign(detU)[..., None])
    Vt = Vt.at[..., 2, :].multiply(jnp.sign(detV)[..., None])
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def recover_pose_from_essential(
    E: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    mask: jax.Array,
    distance_thresh: float = 50.0,
) -> RecoveredPose:
    """Select the cheirality-consistent (R, t) among the 4 decompositions.

    x1/x2: (..., N, 2) normalized camera coordinates; mask: (..., N) bool
    (RANSAC inliers AND padding validity). Mirrors cv::recoverPose: the
    returned mask is the input mask further restricted to points passing
    the positive-bounded-depth test under the winning motion, and
    num_valid is its population count (compared against kMinValidPoints=10
    by the caller, visual_odometry.cpp:270).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)            # (4, ..., 3, 3)
    ts = jnp.stack([t, -t, t, -t], axis=0)              # (4, ..., 3)

    x1b = jnp.broadcast_to(x1, (4, *x1.shape))
    x2b = jnp.broadcast_to(x2, (4, *x2.shape))
    che = cheirality_mask(Rs, ts, x1b, x2b, distance_thresh)  # (4, ..., N)
    che = che & mask[None]
    counts = jnp.sum(che, axis=-1)                       # (4, ...)

    # Tie-break on the bounded count by the UNBOUNDED positive-depth
    # count. In the near-zero-translation limit every triangulated depth
    # exceeds distance_thresh, all four bounded counts tie at 0, and
    # cv::recoverPose's first-maximal pick lands on an arbitrary
    # candidate — a coin flip between the true rotation and its 180-deg
    # twisted pair. Positive depth alone still separates them exactly
    # (measured: 200/200 vs 0/200 on a t~0 scene). Lexicographic key:
    # identical to cv::recoverPose whenever bounded counts differ.
    che_unb = cheirality_mask(Rs, ts, x1b, x2b, jnp.inf) & mask[None]
    n_pts = x1.shape[-2]
    key_lex = counts * (n_pts + 1) + jnp.sum(che_unb, axis=-1)

    best = jnp.argmax(key_lex, axis=0)                   # (...,)

    def take(stacked, idx):
        # stacked: (4, ..., *evt); idx: (...,) -> (..., *evt)
        idx_exp = idx.reshape(idx.shape + (1,) * (stacked.ndim - 1 - idx.ndim))
        return jnp.take_along_axis(stacked, idx_exp[None], axis=0)[0]

    R_best = take(Rs, best)
    t_best = take(ts, best)
    mask_best = take(che, best)
    n_best = take(counts, best)
    return RecoveredPose(R_best, t_best, mask_best, n_best.astype(jnp.int32))
