"""Full ORB detect-and-compute as a fixed-shape, jittable pipeline.

TPU-native rebuild of cv::ORB::detectAndCompute with the reference's exact
configuration (nfeatures=1200, scale=1.2, nlevels=8, edgeThreshold=31,
WTA_K=2, HARRIS_SCORE, patchSize=31, fastThreshold=10 —
visual_odometry.cpp:65-85). Differences from OpenCV are architectural, not
behavioral: keypoint counts are data-dependent in OpenCV; here every stage
runs at fixed capacity with validity masks so the whole frontend compiles
to one static XLA graph:

  per level L (static Python loop, shapes fixed per level):
    FAST-9/16 score map + strict NMS            (features/fast.py, cv-exact)
    edgeThreshold border filter                 (KeyPointsFilter semantics)
    top-(2 n_L) by FAST score                   (retainBest stage 1)
    Harris response at survivors                (features/harris.py)
    top-(n_L) by Harris                         (retainBest stage 2)
    intensity-centroid orientation              (features/orientation.py)
    Gaussian blur + steered rBRIEF-256          (image/filters, features/brief)
  concat levels -> exactly nfeatures slots, coordinates scaled to level 0.

The per-level budget n_L follows OpenCV's geometric allocation.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig
from tpu_vo.features import brief, fast, harris, orientation
from tpu_vo.image.filters import gaussian_blur
from tpu_vo.image.pyramid import build_pyramid, level_sizes


class ORBFeatures(NamedTuple):
    """Fixed-capacity feature set for one image (N = config.n_features)."""

    xy: jax.Array        # (N, 2) float32 level-0 pixel coords (x, y)
    response: jax.Array  # (N,) float32 Harris response
    angle: jax.Array     # (N,) float32 orientation, degrees [0, 360)
    octave: jax.Array    # (N,) int32 pyramid level
    size: jax.Array      # (N,) float32 patchSize * level scale
    desc: jax.Array      # (N, 32) uint8 rBRIEF descriptor (cv2 layout)
    desc32: jax.Array    # (N, 8) uint32 descriptor lanes for matching
    valid: jax.Array     # (N,) bool slot validity


def features_per_level(n_features: int, n_levels: int,
                       scale_factor: float) -> List[int]:
    """OpenCV's geometric per-level feature budget (orb.cpp)."""
    factor = 1.0 / scale_factor
    nd = n_features * (1 - factor) / (1 - factor ** n_levels)
    out = []
    total = 0
    for _ in range(n_levels - 1):
        n = int(np.round(nd))
        out.append(n)
        total += n
        nd *= factor
    out.append(max(n_features - total, 0))
    return out


def _border_mask(h: int, w: int, border: int) -> jax.Array:
    """runByImageBorder: keep 31 <= x < w-31, 31 <= y < h-31."""
    row = jnp.arange(h)
    col = jnp.arange(w)
    return (
        (row[:, None] >= border) & (row[:, None] < h - border)
        & (col[None, :] >= border) & (col[None, :] < w - border)
    )


def _detect_level(lvl: jax.Array, n_level: int, cfg: ORBConfig):
    """One pyramid level: returns (ys, xs, response, angle, bits, valid)."""
    h, w = lvl.shape
    score, keep = fast.detect(lvl, cfg.fast_threshold)
    keep = keep & _border_mask(h, w, cfg.edge_threshold)
    masked = jnp.where(keep, score, 0.0)

    # retainBest(2 * n_level) by FAST score.
    k2 = min(2 * n_level, h * w)
    v2, idx2 = jax.lax.top_k(masked.reshape(-1), k2)
    ys2 = idx2 // w
    xs2 = idx2 % w
    cand_ok = v2 > 0.0

    # Harris re-ranking, retainBest(n_level).
    resp = harris.harris_at(lvl, ys2, xs2)
    resp = jnp.where(cand_ok, resp, -jnp.inf)
    k1 = min(n_level, k2)
    v1, sel = jax.lax.top_k(resp, k1)
    ys = ys2[sel]
    xs = xs2[sel]
    valid = jnp.isfinite(v1)

    ang = orientation.ic_angles_prefix(lvl, ys, xs)
    blurred = gaussian_blur(lvl)
    bits = brief.descriptor_bits(blurred, ys, xs, ang)
    return ys, xs, v1, ang, bits, valid


def detect_and_compute(img: jax.Array, cfg: ORBConfig = ORBConfig()) -> ORBFeatures:
    """ORB features of a (H, W) grayscale image (uint8 or float32 0..255).

    Output slots are ordered by pyramid level (OpenCV emits keypoints in
    the same level order); within a level, by descending Harris response.
    """
    img = img.astype(jnp.float32)
    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = features_per_level(cfg.n_features, cfg.n_levels,
                                 cfg.scale_factor)

    xs_all, ys_all, resp_all, ang_all, bits_all = [], [], [], [], []
    oct_all, size_all, valid_all, scale_all = [], [], [], []
    for level, (lvl, n_level) in enumerate(zip(levels, budgets)):
        if n_level <= 0:
            continue
        ys, xs, resp, ang, bits, valid = _detect_level(lvl, n_level, cfg)
        scale = float(cfg.scale_factor ** level)
        xs_all.append(xs)
        ys_all.append(ys)
        resp_all.append(jnp.where(valid, resp, 0.0))
        ang_all.append(ang)
        bits_all.append(bits)
        oct_all.append(jnp.full(xs.shape, level, dtype=jnp.int32))
        size_all.append(jnp.full(xs.shape, cfg.patch_size * scale,
                                 dtype=jnp.float32))
        scale_all.append(jnp.full(xs.shape, scale, dtype=jnp.float32))
        valid_all.append(valid)

    xs = jnp.concatenate(xs_all)
    ys = jnp.concatenate(ys_all)
    scale = jnp.concatenate(scale_all)
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * scale[:, None]
    bits = jnp.concatenate(bits_all)
    valid = jnp.concatenate(valid_all)
    desc_u8 = jnp.where(valid[:, None], brief.pack_bits_u8(bits), 0)
    desc_u32 = jnp.where(valid[:, None], brief.pack_bits_u32(bits), 0)

    return ORBFeatures(
        xy=jnp.where(valid[:, None], xy, 0.0),
        response=jnp.concatenate(resp_all),
        angle=jnp.concatenate(ang_all),
        octave=jnp.concatenate(oct_all),
        size=jnp.concatenate(size_all),
        desc=desc_u8,
        desc32=desc_u32,
        valid=valid,
    )
