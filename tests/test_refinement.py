"""LM pose refinement tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.geometry import camera, se3
from tpu_vo.models.refinement import (
    refine_relative_pose_lm,
    refine_window,
    so3_exp,
    triangulate_pair_points,
)
from tests.test_geometry import make_two_view_scene


def test_so3_exp_basic(rng):
    np.testing.assert_allclose(
        np.asarray(so3_exp(jnp.zeros(3))), np.eye(3), atol=1e-7)
    w = jnp.asarray([0.0, 0.0, np.pi / 2])
    R = np.asarray(so3_exp(w))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_lm_improves_perturbed_pose(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=150)
    x1 += rng.normal(scale=0.2, size=x1.shape)
    x2 += rng.normal(scale=0.2, size=x2.shape)
    Kj = jnp.asarray(K)
    x1n = camera.normalize_points(jnp.asarray(x1), Kj)
    x2n = camera.normalize_points(jnp.asarray(x2), Kj)

    # perturb the true pose by ~2 degrees and 5 deg translation direction
    ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
    R0 = np.asarray(se3.rotation_from_axis_angle(jnp.asarray(ax), 0.03)) @ R
    t0 = t + 0.08 * rng.normal(size=3)
    t0 /= np.linalg.norm(t0)

    out = refine_relative_pose_lm(
        x1n, x2n, jnp.ones(len(x1), dtype=bool),
        jnp.asarray(R0, dtype=jnp.float64), jnp.asarray(t0, dtype=jnp.float64),
        iters=12,
    )
    assert bool(out.improved)
    err_before = float(se3.geodesic_rotation_distance(
        jnp.asarray(R0), jnp.asarray(R)))
    err_after = float(se3.geodesic_rotation_distance(out.R, jnp.asarray(R)))
    assert err_after < err_before * 0.5, (err_before, err_after)
    t_err_before = np.arccos(np.clip(abs(t0 @ t), -1, 1))
    t_err_after = np.arccos(np.clip(abs(np.asarray(out.t) @ t), -1, 1))
    assert t_err_after < t_err_before * 0.6


def test_lm_keeps_good_pose(rng):
    """Refinement from the truth must not wander off."""
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=100)
    Kj = jnp.asarray(K)
    x1n = camera.normalize_points(jnp.asarray(x1), Kj)
    x2n = camera.normalize_points(jnp.asarray(x2), Kj)
    out = refine_relative_pose_lm(
        x1n, x2n, jnp.ones(100, dtype=bool),
        jnp.asarray(R), jnp.asarray(t), iters=6,
    )
    assert float(se3.geodesic_rotation_distance(out.R, jnp.asarray(R))) < 1e-4


def test_lm_respects_mask(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=120)
    Kj = jnp.asarray(K)
    x1n = np.array(camera.normalize_points(jnp.asarray(x1), Kj))
    x2n = np.array(camera.normalize_points(jnp.asarray(x2), Kj))
    # poison masked-out slots
    x2n[100:] += 10.0
    mask = np.arange(120) < 100
    out = refine_relative_pose_lm(
        jnp.asarray(x1n), jnp.asarray(x2n), jnp.asarray(mask),
        jnp.asarray(R), jnp.asarray(t), iters=6,
    )
    assert float(se3.geodesic_rotation_distance(out.R, jnp.asarray(R))) < 1e-3


def test_triangulate_pair_points(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=50)
    Kj = jnp.asarray(K)
    x1n = camera.normalize_points(jnp.asarray(x1), Kj)
    x2n = camera.normalize_points(jnp.asarray(x2), Kj)
    P = np.asarray(triangulate_pair_points(jnp.asarray(R), jnp.asarray(t),
                                           x1n, x2n))
    np.testing.assert_allclose(P, X, atol=1e-6)


@pytest.mark.slow
def test_refine_window_vmapped(rng):
    P = 3
    x1s, x2s, Rs, ts = [], [], [], []
    for _ in range(P):
        K, R, t, X, x1, x2 = make_two_view_scene(rng, n=80)
        Kj = jnp.asarray(K)
        x1s.append(np.asarray(camera.normalize_points(jnp.asarray(x1), Kj)))
        x2s.append(np.asarray(camera.normalize_points(jnp.asarray(x2), Kj)))
        ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
        Rs.append(np.asarray(se3.rotation_from_axis_angle(jnp.asarray(ax), 0.02)) @ R)
        ts.append(t)
    out = refine_window(
        jnp.asarray(np.stack(x1s)), jnp.asarray(np.stack(x2s)),
        jnp.ones((P, 80), dtype=bool),
        jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)), iters=8,
    )
    assert out.R_rel.shape == (P, 3, 3)
    assert bool(out.improved.all())
