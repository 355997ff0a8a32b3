"""Matching golden tests vs cv2.BFMatcher and the reference's filter."""

import cv2
import numpy as np
import jax.numpy as jnp

from tpu_vo.configs import MatchConfig
from tpu_vo.matching.hamming import (
    hamming_distance_matrix,
    mutual_nearest_match,
    ratio_test_match,
)
from tpu_vo.matching.filter import adaptive_threshold_filter, match_statistics


def random_desc(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def to_u32(d_u8):
    return np.frombuffer(d_u8.tobytes(), dtype="<u4").reshape(len(d_u8), 8)


def test_distance_matrix_exact_both_methods(rng):
    d1 = random_desc(rng, 100)
    d2 = random_desc(rng, 120)
    ref = np.zeros((100, 120), dtype=np.int32)
    for i in range(100):
        ref[i] = np.unpackbits(d1[i] ^ d2, axis=-1).sum(axis=-1)
    for method in ("mxu", "popcount"):
        ours = np.asarray(hamming_distance_matrix(
            jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)), method))
        np.testing.assert_array_equal(ours.astype(np.int32), ref), method


def test_cross_check_matches_cv2(rng):
    """Exact BFMatcher(crossCheck=True) parity on random descriptors."""
    d1 = random_desc(rng, 150)
    d2 = random_desc(rng, 140)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = {(m.queryIdx, m.trainIdx): m.distance
                  for m in bf.match(d1, d2)}

    m = mutual_nearest_match(
        jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)),
        jnp.ones(150, dtype=bool), jnp.ones(140, dtype=bool))
    ours = {(i, int(m.train_idx[i])): float(m.distance[i])
            for i in np.nonzero(np.asarray(m.valid))[0]}
    assert cv_matches == ours


def test_cross_check_respects_validity(rng):
    d1 = random_desc(rng, 60)
    d2 = random_desc(rng, 60)
    v1 = np.ones(60, dtype=bool); v1[40:] = False
    v2 = np.ones(60, dtype=bool); v2[50:] = False
    m = mutual_nearest_match(jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)),
                             jnp.asarray(v1), jnp.asarray(v2))
    valid = np.asarray(m.valid)
    assert not valid[40:].any()
    assert not np.isin(np.asarray(m.train_idx)[valid], np.arange(50, 60)).any()

    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = {(mm.queryIdx, mm.trainIdx) for mm in bf.match(d1[:40], d2[:50])}
    ours = {(i, int(m.train_idx[i])) for i in np.nonzero(valid)[0]}
    assert cv_matches == ours


def test_adaptive_filter_matches_reference_formula(rng):
    """Replicate visual_odometry.cpp:145-180 in numpy and compare."""
    d1 = random_desc(rng, 200)
    d2 = random_desc(rng, 200)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_ms = bf.match(d1, d2)
    dists = sorted(m.distance for m in cv_ms)
    min_d, max_d = dists[0], dists[-1]
    med = dists[len(dists) // 2]  # nth_element upper median
    thr = min(max(3.0 * min_d, 0.7 * med), 35.0)
    ref_good = {(m.queryIdx, m.trainIdx) for m in cv_ms if m.distance < thr}

    m = mutual_nearest_match(jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)),
                             jnp.ones(200, dtype=bool), jnp.ones(200, dtype=bool))
    filt, stats = adaptive_threshold_filter(m, MatchConfig())
    assert float(stats.min) == min_d
    assert float(stats.max) == max_d
    assert float(stats.median) == med
    assert abs(float(stats.threshold) - thr) < 1e-6
    ours = {(i, int(filt.train_idx[i]))
            for i in np.nonzero(np.asarray(filt.valid))[0]}
    assert ref_good == ours


def test_match_statistics_mean(rng):
    d1 = random_desc(rng, 64)
    d2 = random_desc(rng, 64)
    m = mutual_nearest_match(jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)),
                             jnp.ones(64, dtype=bool), jnp.ones(64, dtype=bool))
    stats = match_statistics(m)
    d = np.asarray(m.distance)[np.asarray(m.valid)]
    np.testing.assert_allclose(float(stats.mean), d.mean(), rtol=1e-6)
    assert int(stats.num_matches) == len(d)


def test_ratio_test_matches_cv2_knn(rng):
    d1 = random_desc(rng, 120)
    d2 = random_desc(rng, 130)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    knn = bf.knnMatch(d1, d2, k=2)
    ref = {(p[0].queryIdx, p[0].trainIdx) for p in knn
           if len(p) == 2 and p[0].distance < 0.75 * p[1].distance}
    m = ratio_test_match(jnp.asarray(to_u32(d1)), jnp.asarray(to_u32(d2)),
                         jnp.ones(120, dtype=bool), jnp.ones(130, dtype=bool),
                         ratio=0.75)
    ours = {(i, int(m.train_idx[i]))
            for i in np.nonzero(np.asarray(m.valid))[0]}
    assert ref == ours


def test_empty_and_degenerate_inputs(rng):
    """No valid descriptors -> no matches, finite stats (failure ladder)."""
    d = jnp.zeros((16, 8), dtype=jnp.uint32)
    none = jnp.zeros(16, dtype=bool)
    m = mutual_nearest_match(d, d, none, none)
    assert not bool(np.asarray(m.valid).any())
    filt, stats = adaptive_threshold_filter(m)
    assert int(stats.num_matches) == 0
    assert np.isfinite(float(stats.threshold))
    assert not bool(np.asarray(filt.valid).any())
