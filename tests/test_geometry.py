"""Camera / epipolar / triangulation tests, golden-checked against cv2."""

import cv2
import numpy as np
import jax.numpy as jnp

from tpu_vo.geometry import camera, epipolar, triangulation, se3


def make_two_view_scene(rng, n=60, w=640, h=480):
    """Synthetic calibrated two-view scene with known (R, t)."""
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], dtype=np.float64)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = np.asarray(se3.rotation_from_axis_angle(jnp.asarray(axis), 0.1),
                   dtype=np.float64)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))  # in cam1 frame
    x1 = (K @ X.T).T
    x1 = x1[:, :2] / x1[:, 2:3]
    X2 = (R @ X.T).T + t
    x2 = (K @ X2.T).T
    x2 = x2[:, :2] / x2[:, 2:3]
    return K, R, t, X, x1, x2


def test_intrinsics_match_reference_rule():
    K = np.asarray(camera.intrinsics_from_image_size(1241, 376))
    assert K[0, 0] == 1241 and K[1, 1] == 1241
    assert K[0, 2] == 620.5 and K[1, 2] == 188.0


def test_invert_intrinsics():
    K = camera.intrinsics_from_image_size(640, 480, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(camera.invert_intrinsics(K)) @ np.asarray(K),
        np.eye(3), atol=1e-12,
    )


def test_epipolar_constraint_holds(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    E = epipolar.essential_from_Rt(jnp.asarray(R), jnp.asarray(t))
    F = epipolar.fundamental_from_essential(E, jnp.asarray(K))
    res = np.asarray(epipolar.algebraic_residual(F, jnp.asarray(x1),
                                                 jnp.asarray(x2)))
    assert res.max() < 1e-6
    # Sampson error in normalized coordinates is ~0 for perfect points
    x1n = camera.normalize_points(jnp.asarray(x1), jnp.asarray(K))
    x2n = camera.normalize_points(jnp.asarray(x2), jnp.asarray(K))
    s = np.asarray(epipolar.sampson_error(E, x1n, x2n))
    assert s.max() < 1e-12


def test_fundamental_matches_cv2_computation(rng):
    """F = K^-T E K^-1 must agree with the cv2-computed product."""
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    E = np.asarray(epipolar.essential_from_Rt(jnp.asarray(R), jnp.asarray(t)))
    Kinv = np.linalg.inv(K)
    F_ref = Kinv.T @ E @ Kinv
    F_ours = np.asarray(
        epipolar.fundamental_from_essential(jnp.asarray(E), jnp.asarray(K))
    )
    np.testing.assert_allclose(F_ours, F_ref, atol=1e-12)


def test_point_line_distance_matches_reference_formula(rng):
    line = jnp.asarray([[1.0, 2.0, -3.0]])
    pt = jnp.asarray([[4.0, 5.0]])
    d = float(epipolar.point_line_distance(line, pt)[0])
    expected = abs(1 * 4 + 2 * 5 - 3) / np.sqrt(1 + 4)
    assert abs(d - expected) < 1e-6


def test_F_base_conversions_match_cv2_roundtrip(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    E = epipolar.essential_from_Rt(jnp.asarray(R, dtype=jnp.float64),
                                   jnp.asarray(t, dtype=jnp.float64))
    F0 = epipolar.fundamental_from_essential(E, jnp.asarray(K))
    F1 = epipolar.convert_F_0based_to_1based(F0)
    back = epipolar.convert_F_1based_to_0based(F1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(F0), atol=1e-9)
    # 1-based F satisfies the constraint on shifted points
    h1 = np.concatenate([x1 + 1.0, np.ones((len(x1), 1))], axis=1)
    h2 = np.concatenate([x2 + 1.0, np.ones((len(x2), 1))], axis=1)
    res = np.abs(np.einsum("ni,ij,nj->n", h2, np.asarray(F1), h1))
    assert res.max() < 1e-6


def test_normalize_frobenius():
    F = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)))
    Fn = epipolar.normalize_frobenius(F)
    assert abs(float(jnp.linalg.norm(Fn)) - 1.0) < 1e-6


def test_triangulation_recovers_points(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    x1n = camera.normalize_points(jnp.asarray(x1), jnp.asarray(K))
    x2n = camera.normalize_points(jnp.asarray(x2), jnp.asarray(K))
    P0 = triangulation.projection_matrix(jnp.eye(3, dtype=jnp.float64),
                                         jnp.zeros(3, dtype=jnp.float64))
    P1 = triangulation.projection_matrix(jnp.asarray(R), jnp.asarray(t))
    Q = np.asarray(triangulation.triangulate_dlt(P0, P1, x1n, x2n))
    Xr = Q[:, :3] / Q[:, 3:4]
    np.testing.assert_allclose(Xr, X, atol=1e-4)


def test_triangulation_matches_cv2(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    Kinv = np.linalg.inv(K)
    x1n = (Kinv @ np.concatenate([x1, np.ones((len(x1), 1))], 1).T)[:2]
    x2n = (Kinv @ np.concatenate([x2, np.ones((len(x2), 1))], 1).T)[:2]
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = np.hstack([R, t.reshape(3, 1)])
    Q_cv = cv2.triangulatePoints(P0, P1, x1n, x2n)
    X_cv = (Q_cv[:3] / Q_cv[3]).T
    P0j = triangulation.projection_matrix(jnp.eye(3, dtype=jnp.float64),
                                          jnp.zeros(3, dtype=jnp.float64))
    P1j = triangulation.projection_matrix(jnp.asarray(R), jnp.asarray(t))
    Q = np.asarray(triangulation.triangulate_dlt(
        P0j, P1j, jnp.asarray(x1n.T), jnp.asarray(x2n.T)))
    X_ours = Q[:, :3] / Q[:, 3:4]
    np.testing.assert_allclose(X_ours, X_cv, atol=1e-4)


def test_cheirality_midpoint_matches_dlt(rng):
    """Closed-form fast path agrees with the DLT replica of recoverPose."""
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=200)
    x1 += rng.normal(scale=0.3, size=x1.shape)
    x2 += rng.normal(scale=0.3, size=x2.shape)
    x1n = camera.normalize_points(jnp.asarray(x1), jnp.asarray(K))
    x2n = camera.normalize_points(jnp.asarray(x2), jnp.asarray(K))
    for Rt, tt in [(R, t), (R, -t)]:
        mid = np.asarray(triangulation.cheirality_mask(
            jnp.asarray(Rt), jnp.asarray(tt), x1n, x2n, method="midpoint"))
        dlt = np.asarray(triangulation.cheirality_mask(
            jnp.asarray(Rt), jnp.asarray(tt), x1n, x2n, method="dlt"))
        assert (mid == dlt).mean() > 0.97, (mid.sum(), dlt.sum())


def test_cheirality_selects_true_motion(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng)
    x1n = camera.normalize_points(jnp.asarray(x1), jnp.asarray(K))
    x2n = camera.normalize_points(jnp.asarray(x2), jnp.asarray(K))
    good = np.asarray(triangulation.cheirality_mask(
        jnp.asarray(R), jnp.asarray(t), x1n, x2n))
    assert good.sum() == len(X)
    # Reversed translation puts points behind a camera for most scenes
    bad = np.asarray(triangulation.cheirality_mask(
        jnp.asarray(R), jnp.asarray(-t), x1n, x2n))
    assert bad.sum() < good.sum()
