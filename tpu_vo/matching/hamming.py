"""Brute-force Hamming matching of 256-bit descriptors.

TPU-native equivalent of the reference's cv::BFMatcher(NORM_HAMMING,
crossCheck=true) (created at visual_odometry.cpp:87, used at :153). Two
distance backends, both exact:

  - "mxu": descriptors unpacked to +-1 bfloat16 vectors; for a, b in
    {-1,+1}^256, popcount(a XOR b) = (256 - <a,b>) / 2, so the full N x M
    distance matrix is one 256-deep matmul on the systolic array with
    float32 accumulation (integers up to 256 are exact). This is the
    production path — the entire matching stage becomes MXU work.
  - "popcount": XOR + lax.population_count over packed uint32 lanes (VPU).

Mutual-nearest cross-check mirrors BFMatcher: query i matches train j iff
j = argmin_j d(i, j) and i = argmin_i d(i, j), with lowest-index
tie-breaking like OpenCV's sequential scans. Invalid slots get distance
MAX_DIST and can never match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_DIST = 512.0  # > 256, sentinel for invalid pairs


class Matches(NamedTuple):
    """Fixed-capacity match set: one slot per query descriptor."""

    train_idx: jax.Array  # (N,) int32 best train index per query
    distance: jax.Array   # (N,) float32 Hamming distance
    valid: jax.Array      # (N,) bool — survived cross-check and masks


def _unpack_pm1(desc32: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) +-1 vectors."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc32[..., :, None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(*desc32.shape[:-1], 256)
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


def hamming_distance_matrix(d1: jax.Array, d2: jax.Array,
                            method: str = "mxu") -> jax.Array:
    """(N, M) float32 exact Hamming distances from (N|M, 8) uint32 lanes."""
    if method == "mxu":
        a = _unpack_pm1(d1)
        b = _unpack_pm1(d2)
        dot = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (256.0 - dot) * 0.5
    if method == "popcount":
        x = d1[:, None, :] ^ d2[None, :, :]
        return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    raise ValueError(f"unknown method {method!r}")


def masked_distances(d1: jax.Array, d2: jax.Array, valid1: jax.Array,
                     valid2: jax.Array, method: str = "mxu") -> jax.Array:
    dist = hamming_distance_matrix(d1, d2, method)
    mask = valid1[:, None] & valid2[None, :]
    return jnp.where(mask, dist, MAX_DIST)


def mutual_nearest_match(d1: jax.Array, d2: jax.Array, valid1: jax.Array,
                         valid2: jax.Array, method: str = "mxu") -> Matches:
    """BFMatcher(crossCheck=true) semantics on fixed-capacity inputs."""
    dist = masked_distances(d1, d2, valid1, valid2, method)
    best_j = jnp.argmin(dist, axis=1)                   # (N,) per query
    best_i = jnp.argmin(dist, axis=0)                   # (M,) per train
    d_best = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    i_idx = jnp.arange(dist.shape[0])
    mutual = best_i[best_j] == i_idx
    ok = mutual & valid1 & (d_best < MAX_DIST)
    return Matches(
        train_idx=best_j.astype(jnp.int32),
        distance=jnp.where(ok, d_best, MAX_DIST),
        valid=ok,
    )


def ratio_test_match(d1: jax.Array, d2: jax.Array, valid1: jax.Array,
                     valid2: jax.Array, ratio: float = 0.75,
                     method: str = "mxu") -> Matches:
    """Lowe ratio-test matching (the high-density benchmark variant)."""
    dist = masked_distances(d1, d2, valid1, valid2, method)
    best_j = jnp.argmin(dist, axis=1)
    d1st = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    masked = dist.at[jnp.arange(dist.shape[0]), best_j].set(MAX_DIST)
    d2nd = jnp.min(masked, axis=1)
    ok = valid1 & (d1st < MAX_DIST) & (d1st < ratio * d2nd)
    return Matches(
        train_idx=best_j.astype(jnp.int32),
        distance=jnp.where(ok, d1st, MAX_DIST),
        valid=ok,
    )
