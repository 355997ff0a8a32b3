"""The jittable per-frame VO step: frame in, pose out.

Functional re-design of VisualOdometry::process_frame
(visual_odometry.cpp:323-378). The reference mutates a Frame and branches
on data (match counts, RANSAC success, cheirality gates); here the step is
a pure function on fixed-shape arrays and every branch of the failure
ladder (SURVEY.md §5) is a masked select, so the whole step compiles to
one XLA graph with data-independent control flow:

  (a) first frame            -> identity pose          (:327-337)
  (b) < 10 good matches      -> hold previous pose     (:340-345)
  (c) RANSAC failed          -> hold previous pose     (:218-221 via :351)
  (d) weak geometry (inliers < 12 or cheirality < 10)
                             -> rotation-only, scale 0 (:270-277, :351-353)
  (e) good pose              -> scale 0.3 composition  (:352-358)

Matched-pair extraction, essential-matrix RANSAC, pose recovery and SE3
composition all run unconditionally (fixed cost) and the gates choose
which result becomes the new state — the TPU-idiomatic replacement for
early returns.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_vo.configs import VOConfig
from tpu_vo.estimation.ransac import (
    find_essential_ransac,
    pixel_threshold_to_normalized,
)
from tpu_vo.estimation.recover_pose import recover_pose_from_essential
from tpu_vo.features.orb import ORBFeatures, detect_and_compute
from tpu_vo.geometry import se3
from tpu_vo.geometry.camera import (
    intrinsics,
    normalize_points,
)
from tpu_vo.geometry.epipolar import (
    algebraic_residual,
    fundamental_from_essential,
)
from tpu_vo.geometry.se3 import Pose
from tpu_vo.matching.filter import adaptive_threshold_filter
from tpu_vo.matching.hamming import mutual_nearest_match, ratio_test_match


class VOState(NamedTuple):
    """Carried frame-to-frame: pose + previous features (+ frame counter)."""

    pose: Pose                 # current camera->world pose T_wc
    prev: ORBFeatures          # previous frame's features
    initialized: jax.Array     # () bool
    frame_idx: jax.Array       # () int32
    rng: jax.Array             # base PRNG key; per-frame keys are
                               # fold_in(rng, frame_idx) so the scan and
                               # batched runners draw identical samples


class VOStepOutput(NamedTuple):
    """Per-frame record mirroring the reference's debug prints."""

    pose: Pose                 # pose after this frame
    num_keypoints: jax.Array   # () int32 (print at :116)
    num_matches: jax.Array     # () int32 good matches (:362)
    num_inliers: jax.Array     # () int32 RANSAC inliers (:266)
    num_valid_points: jax.Array  # () int32 cheirality-valid (:279)
    pose_ok: jax.Array         # () bool (:362)
    scale: jax.Array           # () float32 0.3 / 0.0 (:363)
    epipolar_residual: jax.Array  # () float32 mean |x2^T F x1| (:262)
    F: jax.Array               # (3, 3) float32 last fundamental (:244-246)
    has_F: jax.Array           # () bool (:246)


def initial_state(cfg: VOConfig, seed: int = 0) -> VOState:
    n = cfg.orb.n_features
    empty = ORBFeatures(
        xy=jnp.zeros((n, 2), jnp.float32),
        response=jnp.zeros((n,), jnp.float32),
        angle=jnp.zeros((n,), jnp.float32),
        octave=jnp.zeros((n,), jnp.int32),
        size=jnp.zeros((n,), jnp.float32),
        desc=jnp.zeros((n, 32), jnp.uint8),
        desc32=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.zeros((n,), bool),
    )
    return VOState(
        pose=Pose.identity(dtype=jnp.float32),
        prev=empty,
        initialized=jnp.asarray(False),
        frame_idx=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


def estimate_pair(prev: ORBFeatures, cur: ORBFeatures, key: jax.Array,
                  cfg: VOConfig):
    """Match two feature sets and estimate relative motion (c2<-c1).

    Functional equivalent of get_good_matches_of_features +
    estimate_relative_pose (visual_odometry.cpp:145-281). Returns a dict of
    fixed-shape results; gates are returned as booleans, never branched on.
    """
    # cfg.intrinsics is the guess rule fx=fy=W (visual_odometry.cpp:90-98)
    # unless a calibrated override is set (e.g. KITTI calib.txt, io/kitti.py)
    K = intrinsics(*cfg.intrinsics)
    rcfg = cfg.ransac

    if cfg.match.use_ratio_test:
        raw = ratio_test_match(prev.desc32, cur.desc32, prev.valid, cur.valid,
                               cfg.match.ratio)
        good = raw
        from tpu_vo.matching.filter import match_statistics
        stats = match_statistics(raw, cfg.match)
    else:
        raw = mutual_nearest_match(prev.desc32, cur.desc32, prev.valid,
                                   cur.valid)
        good, stats = adaptive_threshold_filter(raw, cfg.match)

    n_good = jnp.sum(good.valid).astype(jnp.int32)

    # Gather matched pixel coordinates (prev = points1, cur = points2).
    p1 = prev.xy                                   # (N, 2) level-0 pixels
    p2 = cur.xy[good.train_idx]                    # (N, 2)
    mask = good.valid

    x1n = normalize_points(p1, K)
    x2n = normalize_points(p2, K)
    thr = pixel_threshold_to_normalized(rcfg.threshold_px, K)

    # Full-f32 matmuls for the estimation linear algebra: the TPU default
    # (bf16-reduced passes) corrupts the 5-point nullspace / refit Gram
    # matrices enough to cause sporadic multi-degree rotation errors
    # (measured: mean rot err 0.77deg with spikes to 4.4deg at default
    # precision vs 0.20deg spike-free at highest; cv2 reference is 0.23).
    # Scoped here so the frontend/matching keep their fast bf16 paths.
    with jax.default_matmul_precision("highest"):
        res = find_essential_ransac(
            x1n, x2n, mask, key, thr,
            max_iters=rcfg.max_iters,
            use_five_point=rcfg.use_five_point,
            score=rcfg.score_method,
            score_sigma_scale=rcfg.score_sigma_scale,
            adaptive_sigma=rcfg.adaptive_sigma,
            cheirality_gate=rcfg.cheirality_gate,
            cheirality_min_frac=rcfg.cheirality_min_frac,
            distance_thresh=rcfg.distance_thresh,
        )
        rec = recover_pose_from_essential(
            res.E, x1n, x2n, res.inliers, rcfg.distance_thresh
        )

    # estimate_relative_pose's verdict (visual_odometry.cpp:189,218,270-277)
    attempted = n_good >= rcfg.min_matches_for_pose
    pose_ok = (
        attempted
        & (n_good >= rcfg.min_matches_attempt)
        & res.success
        & (rec.num_valid >= rcfg.min_valid_points)
        & (res.num_inliers >= rcfg.min_inliers)
    )
    if rcfg.min_valid_fraction > 0.0:
        # optional non-reference gate against twisted-pair cheirality wins
        frac_ok = (rec.num_valid.astype(jnp.float32)
                   >= rcfg.min_valid_fraction
                   * jnp.maximum(res.num_inliers, 1).astype(jnp.float32))
        pose_ok = pose_ok & frac_ok
    # R, t "non-empty" in the reference sense: RANSAC produced a model.
    have_rt = attempted & res.success
    if rcfg.min_valid_fraction > 0.0:
        # A near-split cheirality vote means R itself is untrustworthy
        # (possibly the twisted pair) — skip even the rotation-only
        # fallback and hold the previous pose.
        frac_ok2 = (rec.num_valid.astype(jnp.float32)
                    >= rcfg.min_valid_fraction
                    * jnp.maximum(res.num_inliers, 1).astype(jnp.float32))
        have_rt = have_rt & frac_ok2

    F = fundamental_from_essential(res.E, K)
    resid = algebraic_residual(F, p1, p2)
    inl = res.inliers
    n_inl = jnp.maximum(jnp.sum(inl), 1)
    mean_resid = jnp.sum(jnp.where(inl, resid, 0.0)) / n_inl

    return dict(
        n_keypoints=jnp.sum(cur.valid).astype(jnp.int32),
        n_good=n_good,
        stats=stats,
        R=rec.R,
        t=rec.t,
        have_rt=have_rt,
        pose_ok=pose_ok,
        n_inliers=res.num_inliers,
        n_valid_points=rec.num_valid,
        F=F,
        mean_residual=mean_resid,
        # matched-correspondence slots for downstream refinement (config 5)
        match_train_idx=good.train_idx,
        match_mask=res.inliers,
    )


def apply_motion(prev_pose: Pose, R_c2_c1: jax.Array, t_c2_c1: jax.Array,
                 have_rt: jax.Array, pose_ok: jax.Array, cfg: VOConfig):
    """World-pose update with the reference's scale/fallback ladder."""
    scale = jnp.where(pose_ok, cfg.trajectory_scale, 0.0).astype(jnp.float32)
    R_inv, t_inv = se3.invert_relative(R_c2_c1, t_c2_c1)
    candidate = se3.compose_next_pose(prev_pose, R_inv, t_inv, scale)
    keep = have_rt
    new_R = jnp.where(keep, candidate.R, prev_pose.R)
    new_t = jnp.where(keep, candidate.t, prev_pose.t)
    return Pose(new_R, new_t), scale


def vo_step(state: VOState, frame: jax.Array,
            cfg: VOConfig) -> tuple[VOState, VOStepOutput]:
    """Process one (H, W) grayscale frame; pure and jit-compatible.

    Use functools.partial(jax.jit, static_argnums=2) or close over cfg.
    """
    feats = detect_and_compute(frame, cfg.orb)
    subkey = jax.random.fold_in(state.rng, state.frame_idx)

    est = estimate_pair(state.prev, feats, subkey, cfg)

    moved, scale = apply_motion(
        state.pose, est["R"], est["t"], est["have_rt"], est["pose_ok"], cfg
    )

    # First frame: identity pose, nothing estimated (:327-337).
    first = ~state.initialized
    new_pose = Pose(
        jnp.where(first, jnp.eye(3, dtype=jnp.float32), moved.R),
        jnp.where(first, jnp.zeros(3, dtype=jnp.float32), moved.t),
    )

    new_state = VOState(
        pose=new_pose,
        prev=feats,
        initialized=jnp.asarray(True),
        frame_idx=state.frame_idx + 1,
        rng=state.rng,
    )
    out = VOStepOutput(
        pose=new_pose,
        num_keypoints=est["n_keypoints"],
        num_matches=jnp.where(first, 0, est["n_good"]),
        num_inliers=jnp.where(first, 0, est["n_inliers"]),
        num_valid_points=jnp.where(first, 0, est["n_valid_points"]),
        pose_ok=jnp.where(first, False, est["pose_ok"]),
        scale=jnp.where(first, 0.0, scale),
        epipolar_residual=jnp.where(first, 0.0, est["mean_residual"]),
        F=est["F"],
        has_F=jnp.where(first, False, est["have_rt"]),
    )
    return new_state, out
