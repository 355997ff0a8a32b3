"""SE(3) rigid transforms stored camera->world, as JAX pytrees.

Convention (matches /root/reference/src/pose.h:26-78 and
geometry_conventions.h): a pose holds (R_wc, t_wc) with

    x_w = R_wc @ x_c + t_wc,       camera center C_w = t_wc,
    R_cw = R_wc^T,                  t_cw = -R_wc^T @ t_wc.

Relative motion between cameras follows visual_odometry.cpp:292-314:
`recover_pose` yields (R_c2_c1, t_c2_c1) with x_c2 = R x_c1 + t; the world
pose chain composes the *inverse* of that motion scaled by a fixed factor.

All functions broadcast over arbitrary leading batch dimensions, so the same
code paths serve a single pose, a trajectory of N poses, or a sharded
(batch, N) block without modification. `compose` is associative, which makes
trajectory chaining a `jax.lax.associative_scan` (see pipeline/runner.py) —
the TPU-native replacement for the reference's serial pose loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pose(NamedTuple):
    """Camera->world rigid transform. R: (..., 3, 3), t: (..., 3)."""

    R: jax.Array
    t: jax.Array

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return Pose(R, t)

    @property
    def C_w(self) -> jax.Array:
        """Camera center in world coordinates (pose.h:77)."""
        return self.t

    def matrix(self) -> jax.Array:
        """Homogeneous 4x4 T_wc (pose.h:53-58)."""
        return homogeneous(self.R, self.t)

    def inverse_matrix(self) -> jax.Array:
        """Homogeneous 4x4 T_cw (pose.h:68-75)."""
        inv = inverse(self)
        return homogeneous(inv.R, inv.t)


def homogeneous(R: jax.Array, t: jax.Array) -> jax.Array:
    """Stack (R, t) into a homogeneous (..., 4, 4) transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, (*batch, 3, 3))
    t = jnp.broadcast_to(t, (*batch, 3))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(pose: Pose) -> Pose:
    """Invert: (R, t) -> (R^T, -R^T t)."""
    RT = jnp.swapaxes(pose.R, -1, -2)
    return Pose(RT, -jnp.einsum("...ij,...j->...i", RT, pose.t))


def compose(a: Pose, b: Pose) -> Pose:
    """a then b in a's frame: T_a @ T_b (matrix composition order)."""
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Pose(R, t)


def cumulative_compose(rel: Pose) -> Pose:
    """Inclusive prefix composition of relative poses along axis 0.

    cum[i] = rel[0] ∘ rel[1] ∘ ... ∘ rel[i] (compose order: earlier pose on
    the left). Hillis–Steele doubling: ceil(log2 n) levels, each ONE batched
    3×3 matmul + einsum over the whole axis. `lax.associative_scan`'s
    odd/even recursion lowers to ~20× more (strided-slice + tiny-op) HLOs,
    which on a v5e measured 4.5 ms for n=63 — pure per-op latency; this
    form is ~0.3 ms on the same shapes (tools/profile_headline.py).
    """
    R, t = rel.R, rel.t
    n = R.shape[0]
    d = 1
    # Full-f32 matmuls: a trajectory is a product of up to n rotations and
    # reduced-precision passes compound across the log-depth levels. The
    # whole scan is ~log2(n) batched 3x3 matmuls — precision is free here.
    with jax.default_matmul_precision("highest"):
        while d < n:
            # positions i >= d pick up the prefix ending at i-d
            a = Pose(R[:-d], t[:-d])        # cum-so-far at i-d
            b = Pose(R[d:], t[d:])          # partial at i
            c = compose(a, b)
            R = jnp.concatenate([R[:d], c.R], axis=0)
            t = jnp.concatenate([t[:d], c.t], axis=0)
            d *= 2
    return Pose(R, t)


def transform_points(pose: Pose, pts: jax.Array) -> jax.Array:
    """Apply x_w = R x + t to points of shape (..., 3)."""
    return jnp.einsum("...ij,...j->...i", pose.R, pts) + pose.t


def invert_relative(R_c2_c1: jax.Array, t_c2_c1: jax.Array):
    """Invert x_c2 = R x_c1 + t into x_c1 = R^T x_c2 - R^T t.

    Mirrors invert_relative_camera_to_camera_transform
    (visual_odometry.cpp:292-301).
    """
    RT = jnp.swapaxes(R_c2_c1, -1, -2)
    return RT, -jnp.einsum("...ij,...j->...i", RT, t_c2_c1)


def compose_next_pose(prev: Pose, R_c1_c2: jax.Array, t_c1_c2: jax.Array,
                      scale) -> Pose:
    """T_w_c2 = T_w_c1 * T_c1_c2 with translation scaled by `scale`.

    Mirrors compose_next_camera_to_world_pose_from_inverse_relative_motion
    (visual_odometry.cpp:303-314): the rotation always composes; the
    translation increment is scale * (R_wc_prev @ t_c1_c2), so scale=0 gives
    the reference's rotation-only fallback.
    """
    scale = jnp.asarray(scale, dtype=prev.t.dtype)
    R = prev.R @ R_c1_c2
    t = prev.t + scale[..., None] * jnp.einsum("...ij,...j->...i", prev.R, t_c1_c2)
    return Pose(R, t)


def rotation_from_axis_angle(axis: jax.Array, angle) -> jax.Array:
    """Rodrigues rotation from unit axis (..., 3) and angle (...,)."""
    angle = jnp.asarray(angle, dtype=axis.dtype)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    K = skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix [v]_x of shape (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rotation_to_quaternion(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), TUM convention.

    Branch-free Shepperd's method: compute all four candidate columns and
    select by the largest diagonal combination (jit/vmap-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # candidate 0: w largest
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0,
                    0.25 * s0], axis=-1)
    # candidate 1: x largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1,
                    (m21 - m12) / s1], axis=-1)
    # candidate 2: y largest
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2,
                    (m02 - m20) / s2], axis=-1)
    # candidate 3: z largest
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3,
                    (m10 - m01) / s3], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    pick = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, pick[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_rotation(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion (x, y, z, w) -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
    ], axis=-2)


def geodesic_rotation_distance(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    """Angle (radians) between two rotations; used by tests and metrics."""
    tr = jnp.trace(jnp.swapaxes(Ra, -1, -2) @ Rb, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)
