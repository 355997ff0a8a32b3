"""SE(3) semantics tests, pinned to the reference's pose algebra.

Reference semantics under test:
  - pose.h:53-77 (T_wc / T_cw / C_w relationships)
  - visual_odometry.cpp:292-314 (relative-motion inversion and composition)
"""

import numpy as np
import jax.numpy as jnp

from tpu_vo.geometry import se3
from tpu_vo.geometry.se3 import Pose


def random_rotation(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-np.pi, np.pi)
    return np.asarray(se3.rotation_from_axis_angle(jnp.asarray(axis), angle))


def random_pose(rng):
    return Pose(
        jnp.asarray(random_rotation(rng), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=3), dtype=jnp.float32),
    )


def test_identity_matches_reference_default(rng):
    p = Pose.identity()
    np.testing.assert_allclose(np.asarray(p.R), np.eye(3))
    np.testing.assert_allclose(np.asarray(p.t), np.zeros(3))
    np.testing.assert_allclose(np.asarray(p.matrix()), np.eye(4))


def test_inverse_roundtrip(rng):
    p = random_pose(rng)
    pi = se3.inverse(p)
    T = np.asarray(p.matrix())
    Ti = np.asarray(pi.matrix())
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-5)
    # T_cw matches pose.h:63-66: t_cw = -R^T t
    np.testing.assert_allclose(
        np.asarray(pi.t), -np.asarray(p.R).T @ np.asarray(p.t), atol=1e-6
    )


def test_compose_matches_matrix_product(rng):
    a, b = random_pose(rng), random_pose(rng)
    c = se3.compose(a, b)
    np.testing.assert_allclose(
        np.asarray(c.matrix()),
        np.asarray(a.matrix()) @ np.asarray(b.matrix()),
        atol=1e-5,
    )


def test_compose_is_associative(rng):
    a, b, c = (random_pose(rng) for _ in range(3))
    lhs = se3.compose(se3.compose(a, b), c)
    rhs = se3.compose(a, se3.compose(b, c))
    np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-5)


def test_invert_relative_matches_reference(rng):
    """visual_odometry.cpp:292-301: R' = R^T, t' = -R^T t."""
    R = jnp.asarray(random_rotation(rng), dtype=jnp.float32)
    t = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    Ri, ti = se3.invert_relative(R, t)
    np.testing.assert_allclose(np.asarray(Ri), np.asarray(R).T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ti), -np.asarray(R).T @ np.asarray(t), atol=1e-6
    )


def test_compose_next_pose_matches_reference(rng):
    """visual_odometry.cpp:303-314 semantics, including scale=0 fallback."""
    prev = random_pose(rng)
    R_rel = jnp.asarray(random_rotation(rng), dtype=jnp.float32)
    t_rel = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)

    out = se3.compose_next_pose(prev, R_rel, t_rel, 0.3)
    np.testing.assert_allclose(
        np.asarray(out.R), np.asarray(prev.R) @ np.asarray(R_rel), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.t),
        np.asarray(prev.t) + 0.3 * (np.asarray(prev.R) @ np.asarray(t_rel)),
        atol=1e-5,
    )

    # Rotation-only fallback: scale = 0 freezes translation.
    out0 = se3.compose_next_pose(prev, R_rel, t_rel, 0.0)
    np.testing.assert_allclose(np.asarray(out0.t), np.asarray(prev.t), atol=1e-6)


def test_batched_broadcasting(rng):
    Rs = jnp.stack([jnp.asarray(random_rotation(rng)) for _ in range(5)])
    ts = jnp.asarray(rng.normal(size=(5, 3)))
    batch = Pose(Rs.astype(jnp.float32), ts.astype(jnp.float32))
    inv = se3.inverse(batch)
    assert inv.R.shape == (5, 3, 3)
    composed = se3.compose(batch, inv)
    np.testing.assert_allclose(
        np.asarray(composed.R), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5
    )


def test_transform_points_roundtrip(rng):
    p = random_pose(rng)
    pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    back = se3.transform_points(se3.inverse(p), se3.transform_points(p, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
