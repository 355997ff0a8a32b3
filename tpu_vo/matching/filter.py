"""Adaptive match filtering, mirroring get_good_matches_of_features.

The reference (visual_odometry.cpp:145-180) sorts matches by Hamming
distance, computes min/max/mean/median, then keeps matches with
    d < min(max(3 * min_dist, 0.7 * median_dist), 35.0).
OpenCV's median is the upper median (nth_element at size/2 of the sorted
distances). Here everything is a masked reduction over the fixed-capacity
match slots — no host-side sorting or dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_vo.configs import MatchConfig
from tpu_vo.matching.hamming import MAX_DIST, Matches


class MatchStats(NamedTuple):
    """The reference's [MatchDebug] record (units: Hamming bits)."""

    num_matches: jax.Array  # int32
    min: jax.Array
    max: jax.Array
    mean: jax.Array
    median: jax.Array
    threshold: jax.Array


def match_statistics(m: Matches, cfg: MatchConfig = MatchConfig()) -> MatchStats:
    d = jnp.where(m.valid, m.distance, jnp.inf)
    n = jnp.sum(m.valid).astype(jnp.int32)
    has = n > 0
    dmin = jnp.where(has, jnp.min(d), 0.0)
    dmax = jnp.where(has, jnp.max(jnp.where(m.valid, m.distance, -jnp.inf)), 0.0)
    dsum = jnp.sum(jnp.where(m.valid, m.distance, 0.0))
    dmean = jnp.where(has, dsum / jnp.maximum(n, 1), 0.0)
    # Upper median: sorted[n // 2] (std::nth_element at mid = size/2).
    dsort = jnp.sort(d)
    dmed = jnp.where(has, dsort[jnp.maximum(n // 2, 0)], 0.0)
    thr = jnp.minimum(
        jnp.maximum(cfg.min_scale * dmin, cfg.median_scale * dmed),
        cfg.max_hamming,
    )
    return MatchStats(n, dmin, dmax, dmean, dmed, thr)


def adaptive_threshold_filter(m: Matches,
                              cfg: MatchConfig = MatchConfig()):
    """Apply the reference threshold; returns (filtered Matches, MatchStats)."""
    stats = match_statistics(m, cfg)
    keep = m.valid & (m.distance < stats.threshold)
    return Matches(
        train_idx=m.train_idx,
        distance=jnp.where(keep, m.distance, MAX_DIST),
        valid=keep,
    ), stats
