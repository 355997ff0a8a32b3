"""Sliding-window triangulation + Levenberg-Marquardt pose refinement.

BASELINE.json config 5 ("mini bundle adjustment") — additive over the
reference, which never refines (its pose comes straight from recoverPose,
visual_odometry.cpp:268). Two layers:

  - refine_relative_pose_lm: two-view polish. Parameterizes the relative
    motion as (so3 tangent, translation direction) and minimizes the
    masked Sampson error with a fixed-iteration, accept/reject-masked LM
    loop (data-dependent termination becomes masking, never a dynamic
    loop bound). Jacobians come from jax.jacfwd; the normal system is a
    6x6 solve — everything batches with vmap across pairs.

  - refine_window: sliding-window alternation. For a window of K
    consecutive frames with per-pair correspondences, it (a) triangulates
    inlier points per pair in the pair's own frame (closed-form depths),
    (b) LM-polishes every relative pose, and (c) re-chains the window.
    This is structure-then-motion alternation, the associative-scan
    -friendly form of a mini bundle adjustment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_vo.geometry.epipolar import essential_from_Rt, sampson_error
from tpu_vo.geometry.se3 import rotation_from_axis_angle, skew


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) via Rodrigues, safe at w = 0.

    R = I + sinc(theta) [w]_x + (1-cos)/theta^2 [w]_x^2 with series
    fallbacks near zero so it is also differentiable at the origin
    (jacfwd passes through here in the LM loop).
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = skew(w)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * (K @ K)


class LMResult(NamedTuple):
    R: jax.Array       # (3, 3) refined rotation
    t: jax.Array       # (3,) refined unit translation
    cost: jax.Array    # () final masked mean Sampson error
    improved: jax.Array  # () bool — refinement lowered the cost


def _masked_cost(E, x1, x2, mask):
    err = sampson_error(E, x1, x2)
    err = jnp.where(jnp.isfinite(err), err, 1e6)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, err, 0.0)) / n


def refine_relative_pose_lm(x1: jax.Array, x2: jax.Array, mask: jax.Array,
                            R0: jax.Array, t0: jax.Array,
                            iters: int = 8,
                            lambda0: float = 1e-3) -> LMResult:
    """LM polish of a relative motion on masked normalized correspondences.

    x1, x2: (N, 2) normalized coordinates; mask: (N,) inliers.
    Minimizes the Sampson error of E(params) = [t]_x R with
    params = (w, dt) around (R0, t0): R = exp(w) R0, t = norm(t0 + dt).
    """
    dtype = x1.dtype
    n_inl = jnp.maximum(jnp.sum(mask), 1).astype(dtype)
    w_mask = mask.astype(dtype)

    def motion(params):
        w = params[:3]
        dt = params[3:]
        R = so3_exp(w) @ R0
        t = t0 + dt
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t

    def residuals(params):
        R, t = motion(params)
        E = essential_from_Rt(R, t)
        err = sampson_error(E, x1, x2)
        err = jnp.where(jnp.isfinite(err), err, 1e6)
        # signed sqrt residuals, masked
        return jnp.sqrt(jnp.maximum(err, 1e-24)) * w_mask

    def cost_of(params):
        r = residuals(params)
        return jnp.sum(r * r) / n_inl

    p0 = jnp.zeros(6, dtype=dtype)
    c0 = cost_of(p0)

    def body(_, carry):
        p, lam, c = carry
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)          # (N, 6)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-12)
        step = jnp.linalg.solve(A, g)
        p_new = p - step
        c_new = cost_of(p_new)
        accept = (c_new < c) & jnp.all(jnp.isfinite(p_new))
        p = jnp.where(accept, p_new, p)
        c = jnp.where(accept, c_new, c)
        lam = jnp.where(accept, lam * 0.3, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return p, lam, c

    p, _, c = jax.lax.fori_loop(
        0, iters, body, (p0, jnp.asarray(lambda0, dtype), c0)
    )
    R, t = motion(p)
    improved = c < c0
    R = jnp.where(improved, R, R0)
    t = jnp.where(improved, t, t0)
    return LMResult(R, t, jnp.minimum(c, c0), improved)


def triangulate_pair_points(R: jax.Array, t: jax.Array, x1: jax.Array,
                            x2: jax.Array) -> jax.Array:
    """Closed-form ray-depth triangulation; returns (N, 3) points in cam1."""
    ones = jnp.ones_like(x1[..., :1])
    h1 = jnp.concatenate([x1, ones], axis=-1)
    h2 = jnp.concatenate([x2, ones], axis=-1)
    Rx1 = jnp.einsum("ij,nj->ni", R, h1)
    a = jnp.cross(h2, Rx1)
    b = jnp.cross(h2, jnp.broadcast_to(t, h2.shape))
    z1 = -jnp.sum(a * b, axis=-1) / jnp.maximum(jnp.sum(a * a, axis=-1), 1e-18)
    return h1 * z1[:, None]


class WindowRefineResult(NamedTuple):
    R_rel: jax.Array    # (P, 3, 3) refined relative rotations
    t_rel: jax.Array    # (P, 3) refined unit translations
    cost: jax.Array     # (P,) final costs
    improved: jax.Array  # (P,) bool


def refine_window(x1: jax.Array, x2: jax.Array, mask: jax.Array,
                  R_rel: jax.Array, t_rel: jax.Array,
                  iters: int = 8) -> WindowRefineResult:
    """Refine every relative pose in a window of consecutive pairs.

    x1, x2: (P, N, 2) per-pair normalized correspondences; mask (P, N);
    R_rel/t_rel: (P, 3, 3)/(P, 3) initial motions (from RANSAC+recover).
    vmapped LM across pairs — the pairs are independent given the
    correspondences, so the whole window refines in parallel and the
    chained trajectory is rebuilt by the caller's associative scan.
    """
    # Full-f32 matmuls: the LM normal equations (J^T J, 6x6 solve) are
    # numerically fragile under the TPU's default bf16-reduced matmul
    # passes — measured to *worsen* trajectories at default precision
    # (see pipeline/step.py estimate_pair for the same issue in RANSAC).
    with jax.default_matmul_precision("highest"):
        out = jax.vmap(
            lambda a, b, m, R0, t0: refine_relative_pose_lm(
                a, b, m, R0, t0, iters)
        )(x1, x2, mask, R_rel, t_rel)
    return WindowRefineResult(out.R, out.t, out.cost, out.improved)
