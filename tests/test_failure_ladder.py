"""The reference's failure ladder as unit tests on estimate_pair/vo_step.

Ladder (visual_odometry.cpp / SURVEY.md §5):
  (b) < 10 good matches        -> hold previous pose (:340-345)
  (c) RANSAC failure           -> hold previous pose (:218-221)
  (d) inliers < 12 or cheirality < 10 -> rotation-only, scale 0 (:270-277)
  (e) healthy                  -> scale 0.3 composition
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpu_vo.configs import MatchConfig, ORBConfig, RansacConfig, VOConfig
from tpu_vo.features.orb import ORBFeatures
from tpu_vo.pipeline.step import estimate_pair

N = 128


def make_features(rng, desc=None, n_valid=N, xy=None):
    d = desc if desc is not None else rng.integers(
        0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    xy_ = xy if xy is not None else rng.uniform(
        40, 200, size=(N, 2)).astype(np.float32)
    valid = np.arange(N) < n_valid
    u8 = np.frombuffer(np.ascontiguousarray(d).tobytes(),
                       dtype=np.uint8).reshape(N, 32)
    return ORBFeatures(
        xy=jnp.asarray(xy_), response=jnp.ones(N, jnp.float32),
        angle=jnp.zeros(N, jnp.float32), octave=jnp.zeros(N, jnp.int32),
        size=jnp.full(N, 31.0, jnp.float32), desc=jnp.asarray(u8),
        desc32=jnp.asarray(d), valid=jnp.asarray(valid),
    )


def perturb_bits(rng, d, n_bits=3):
    """Flip exactly n_bits distinct bits per descriptor (Hamming distance
    exactly n_bits): identical descriptors would give all-zero distances,
    and the reference's threshold min(max(3*min, 0.7*median), 35) keeps
    nothing; a double-flipped bit would give distance 0 for some rows and
    the 3*min term would collapse the threshold."""
    out = d.copy()
    for i in range(len(out)):
        for pos in rng.choice(256, size=n_bits, replace=False):
            out[i, pos // 32] ^= np.uint32(1) << np.uint32(pos % 32)
    return out


def small_cfg():
    return VOConfig(
        image_width=256, image_height=256,
        orb=ORBConfig(n_features=N),
        ransac=RansacConfig(max_iters=32),
    )


def test_too_few_matches_blocks_pose(rng):
    """< 10 good matches -> pose_ok False and have_rt False (rung b)."""
    cfg = small_cfg()
    # only 6 shared descriptors; the rest are random (cross-check kills them)
    shared = rng.integers(0, 2 ** 32, size=(6, 8), dtype=np.uint32)
    d1 = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    d1[:6] = shared
    d2[:6] = shared
    f1 = make_features(rng, d1)
    f2 = make_features(rng, d2)
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg)
    assert int(est["n_good"]) < 10
    assert not bool(est["pose_ok"])
    assert not bool(est["have_rt"])


def test_no_valid_descriptors(rng):
    """Empty feature sets -> zero matches, all gates closed, no NaNs."""
    cfg = small_cfg()
    f1 = make_features(rng, n_valid=0)
    f2 = make_features(rng, n_valid=0)
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg)
    assert int(est["n_good"]) == 0
    assert not bool(est["pose_ok"]) and not bool(est["have_rt"])
    assert np.isfinite(np.asarray(est["R"])).all()


def test_healthy_geometry_passes(rng):
    """Well-distributed true correspondences -> pose_ok with scale path."""
    from tests.test_geometry import make_two_view_scene

    cfg = small_cfg()
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=N, w=256, h=256)
    d = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    f1 = make_features(rng, d, xy=x1.astype(np.float32))
    f2 = make_features(rng, perturb_bits(rng, d), xy=x2.astype(np.float32))
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg)
    assert int(est["n_good"]) == N
    assert bool(est["pose_ok"]) and bool(est["have_rt"])
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(est["R"]).T @ R) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_degenerate_geometry_rotation_only():
    """Matches exist but geometry is junk (random points) -> no pose_ok;
    the composition then uses scale 0 / held pose (rungs c/d).

    Deterministic local seed: with random correspondences a tiny chance
    consensus can exceed the gates for some draws, so this pins one where
    the ladder's negative path is exercised.
    """
    local = np.random.default_rng(1234)
    cfg = small_cfg()
    d = local.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    f1 = make_features(local, d)  # near-identical descriptors -> all match
    f2 = make_features(local, perturb_bits(local, d))  # positions random
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg)
    assert int(est["n_good"]) == N
    assert not bool(est["pose_ok"])
