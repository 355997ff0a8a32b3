"""Dynamic/structured-scene robustness (VERDICT r4 next #2).

Every scene before round 5 was rigid and fully static, so the 2 px /
0.999 RANSAC (visual_odometry.cpp:213-216 settings) had only ever faced
matching noise. These tests exercise the canonical VO failure mode: an
independently moving textured object whose matches are coherent
structured outliers, plus occluders and a low-texture stretch.

The load-bearing test is test_ransac_excludes_moving_object: the
object's matches must be rejected by the RANSAC inlier mask and the
recovered pose must stay close to ground truth despite the object
owning a large match share.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
from tpu_vo.utils.synthetic import (
    make_corridor_sequence,
    make_dynamic_corridor_sequence,
)


def test_generator_deterministic_and_composable():
    a = make_dynamic_corridor_sequence(n_frames=4, width=160, height=120,
                                       obj_size=1.6, n_occluders=2,
                                       low_texture_span=(2.0, 6.0))
    b = make_dynamic_corridor_sequence(n_frames=4, width=160, height=120,
                                       obj_size=1.6, n_occluders=2,
                                       low_texture_span=(2.0, 6.0))
    np.testing.assert_array_equal(np.stack(a[0]), np.stack(b[0]))
    np.testing.assert_array_equal(np.stack(a[4]), np.stack(b[4]))


def test_moving_object_mask_tracks_size():
    """Pixel coverage grows with obj_size and the mask marks the object."""
    covs = []
    for s in (1.2, 2.4):
        f, _, _, _, m = make_dynamic_corridor_sequence(
            n_frames=4, width=160, height=120, obj_size=s)
        covs.append(np.mean([mi.mean() for mi in m]))
    assert 0.01 < covs[0] < covs[1] < 0.6
    # object pixels differ from the object-free render of the same scene
    f0, _, _, _, m0 = make_dynamic_corridor_sequence(
        n_frames=4, width=160, height=120, obj_size=2.4)
    fb, _, _, _, mb = make_dynamic_corridor_sequence(
        n_frames=4, width=160, height=120, obj_size=0.0)
    assert not any(mi.any() for mi in mb)
    on = m0[2]
    assert (f0[2][on] != fb[2][on]).mean() > 0.5


def test_no_object_matches_plain_corridor():
    """With every nuisance off the generator renders the plain corridor
    (same walls for the same seed): the static baseline is shared."""
    fd, Rd, td, Kd, _ = make_dynamic_corridor_sequence(
        n_frames=4, width=160, height=120, seed=3)
    fc, Rc, tc, Kc = make_corridor_sequence(
        n_frames=4, width=160, height=120, seed=3)
    np.testing.assert_array_equal(np.stack(fd), np.stack(fc))
    np.testing.assert_allclose(np.stack(td), np.stack(tc))


def test_low_texture_span_blanks_walls():
    f, _, _, _, _ = make_dynamic_corridor_sequence(
        n_frames=4, width=160, height=120, low_texture_span=(1.0, 14.0))
    fb, _, _, _, _ = make_dynamic_corridor_sequence(
        n_frames=4, width=160, height=120)
    # inside the span the frame loses most of its texture variance
    assert f[2].std() < 0.7 * fb[2].std()


def _gt_relative(R1, t1, R2, t2):
    """x_c2 = R x_c1 + t from camera->world poses (pose.h:53-75)."""
    R = R2.T @ R1
    t = R2.T @ (t1 - t2)
    return R, t


def _rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


@pytest.mark.slow
def test_ransac_excludes_moving_object():
    """The RANSAC inlier mask must exclude the moving object's matches.

    Scene: object holds constant distance ahead of the camera while
    oscillating laterally; pair (4, 5) sits at the lateral-velocity
    maximum, where its matches are maximally inconsistent with the
    camera's epipolar geometry. The object must own a real share of the
    good matches (the test is vacuous otherwise), RANSAC must throw
    nearly all of them out, and the recovered rotation must stay at the
    static-scene level.

    Sizing (measured, round 5): at obj_size=1.2 / 900 features the
    object owns ~32% of the keypoints and RANSAC keeps <=15% of inliers
    on it with rotation error ~0.5 deg; at obj_size=1.6 the object's
    match share crosses the majority threshold and RANSAC locks onto
    the OBJECT's rigid motion instead (27/56 inliers on-object, 6.3 deg
    error) — the domination regime every sample-consensus estimator
    shares, quantified in benchmarks config 7, not asserted here.
    """
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.pipeline.step import estimate_pair

    W, H = 320, 240
    frames, Rs, ts, K, masks = make_dynamic_corridor_sequence(
        n_frames=6, width=W, height=H, obj_size=1.2, obj_period=9.0)
    i, j = 4, 5

    with jax.enable_x64(False):
        cfg = VOConfig(image_width=W, image_height=H,
                       orb=ORBConfig(n_features=900),
                       ransac=RansacConfig(max_iters=192))

        feats = jax.jit(lambda f: detect_and_compute(f, cfg.orb))
        fa = feats(jnp.asarray(frames[i]))
        fb = feats(jnp.asarray(frames[j]))
        est = jax.jit(lambda a, b, k: estimate_pair(a, b, k, cfg))(
            fa, fb, jax.random.PRNGKey(0))

    def on_object(xy, mask):
        x = np.clip(np.round(np.asarray(xy[:, 0])).astype(int), 0, W - 1)
        y = np.clip(np.round(np.asarray(xy[:, 1])).astype(int), 0, H - 1)
        return mask[y, x]

    p1_obj = on_object(np.asarray(fa.xy), masks[i])
    p2 = np.asarray(fb.xy)[np.asarray(est["match_train_idx"])]
    p2_obj = on_object(p2, masks[j])
    obj_match = p1_obj | p2_obj

    inliers = np.asarray(est["match_mask"])
    n_inl = int(inliers.sum())
    assert n_inl >= 30

    # the object must own a real share of candidate matches: compare
    # against the valid keypoints that matched at all (inlier ∪ outlier
    # isn't recoverable post-filter, so use the inlier+object pool)
    n_obj = int((obj_match & np.asarray(fa.valid)).sum())
    assert n_obj >= 100, f"object owns only {n_obj} keypoints - too easy"

    obj_inl = int((inliers & obj_match).sum())
    frac = obj_inl / max(n_inl, 1)
    assert frac <= 0.15, (
        f"{obj_inl}/{n_inl} inliers lie on the moving object")

    R_gt, _ = _gt_relative(Rs[i], ts[i], Rs[j], ts[j])
    err = _rot_angle_deg(np.asarray(est["R"]), R_gt)
    assert bool(est["pose_ok"])
    assert err < 1.0, f"rotation error {err:.2f} deg with moving object"


@pytest.mark.slow
def test_occluders_do_not_break_pose():
    """Static occluding pillars churn the match set but stay
    epipolar-consistent; the pose chain must hold."""
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.metrics import ate_rmse, extent, scale_matched_gt

    W, H = 320, 240
    frames, Rs, ts, K, _ = make_dynamic_corridor_sequence(
        n_frames=8, width=W, height=H, n_occluders=3)
    with jax.enable_x64(False):
        cfg = VOConfig(image_width=W, image_height=H,
                       orb=ORBConfig(n_features=600),
                       ransac=RansacConfig(max_iters=128))
        poses, diags = jax.jit(lambda f: run_sequence_batched(
            f, cfg, frame_chunk=4, pair_chunk=7))(
            jnp.asarray(np.stack(frames)))
    gt = scale_matched_gt(np.stack(ts))
    rel = ate_rmse(np.asarray(poses.t), gt) / extent(gt)
    assert rel < 0.05, f"occluder-scene ATE {rel:.3f} of extent"
    assert np.asarray(diags["pose_ok"]).all()
