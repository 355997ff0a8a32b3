"""Optional min_valid_fraction gate (non-reference accuracy guard)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
from tpu_vo.pipeline.step import estimate_pair
from tests.test_failure_ladder import N, make_features, perturb_bits
from tests.test_geometry import make_two_view_scene


def cfg_with(frac):
    return VOConfig(
        image_width=256, image_height=256,
        orb=ORBConfig(n_features=N),
        ransac=RansacConfig(max_iters=32, min_valid_fraction=frac),
    )


def test_gate_keeps_healthy_pose(rng):
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=N, w=256, h=256)
    d = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    f1 = make_features(rng, d, xy=x1.astype(np.float32))
    f2 = make_features(rng, perturb_bits(rng, d), xy=x2.astype(np.float32))
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg_with(0.5))
    assert bool(est["pose_ok"]) and bool(est["have_rt"])
    # healthy geometry: nearly all inliers pass cheirality
    assert int(est["n_valid_points"]) > 0.9 * int(est["n_inliers"])


def test_gate_blocks_split_cheirality(rng):
    """Construct a scene whose depths exceed recoverPose's distance_thresh
    for many points: the cheirality vote splits and, with the fraction
    gate on, the pose (and the rotation fallback) must be rejected."""
    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=N, w=256, h=256)
    d = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint32)
    f1 = make_features(rng, d, xy=x1.astype(np.float32))
    f2 = make_features(rng, perturb_bits(rng, d), xy=x2.astype(np.float32))
    # Shrink the depth cutoff so most valid points fall outside it.
    cfg = VOConfig(
        image_width=256, image_height=256,
        orb=ORBConfig(n_features=N),
        ransac=RansacConfig(max_iters=32, min_valid_fraction=0.5,
                            distance_thresh=5.0),
    )
    est = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg)
    frac = int(est["n_valid_points"]) / max(int(est["n_inliers"]), 1)
    if frac < 0.5:
        assert not bool(est["pose_ok"])
        assert not bool(est["have_rt"])
    # reference behavior (fraction 0.0) is unchanged
    cfg0 = VOConfig(
        image_width=256, image_height=256,
        orb=ORBConfig(n_features=N),
        ransac=RansacConfig(max_iters=32, distance_thresh=5.0),
    )
    est0 = estimate_pair(f1, f2, jax.random.PRNGKey(0), cfg0)
    assert bool(est0["have_rt"])  # reference still applies rotation-only
