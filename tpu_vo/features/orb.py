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
from tpu_vo.features import brief, fast, harris, patches
from tpu_vo.image.pyramid import build_pyramid


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


def _rank_from_maps(packed, harris_map, idx_bits, w_decode, n_level,
                    cfg, area):
    """Stage-1 FAST cut + stage-2 Harris ranking from the fused kernel's
    (packed, harris) maps. `w_decode` is the flat-index divisor the
    kernel packed with (true level width for the per-level call, padded
    canvas width for the stacked call); `area` is the TRUE level pixel
    count (bounds the retainBest budgets like OpenCV)."""
    from tpu_vo.ops.select_pallas import _bit_reverse

    k2 = min((4 if cfg.retain_best_keep_ties else 2) * n_level, area)
    hp2, wp = packed.shape
    pooled = packed.reshape(hp2, wp // 2, 2).max(-1).reshape(-1)
    k_red = min(k2, pooled.shape[0])
    if cfg.retain_best_keep_ties or cfg.stage1_exact_topk:
        # exact sorted cut (keep-ties needs the exact 2n-th value)
        v, _ = jax.lax.top_k(pooled, k_red)
    else:
        # ApproxTopK prefilter (3.7x faster than the full sort top_k
        # lowers to — benchmarks/topk_micro.json); exact int32 keys
        # re-read at the returned positions. Unordered — stage 2
        # re-ranks by Harris. See ORBConfig.stage1_exact_topk.
        _, i_pre = jax.lax.approx_max_k(
            pooled.astype(jnp.float32), k_red, recall_target=0.95)
        v = pooled[i_pre]
    if k_red < k2:
        v = jnp.pad(v, (0, k2 - k_red))

    v2 = (v >> idx_bits).astype(jnp.float32)
    mask = jnp.int32((1 << idx_bits) - 1)
    idx2 = jnp.where(v > 0, _bit_reverse(mask - (v & mask), idx_bits), 0)
    ys2 = idx2 // w_decode
    xs2 = idx2 % w_decode
    cand_ok = v2 > 0.0
    resp = harris_map[ys2, xs2]

    if cfg.retain_best_keep_ties:
        # retainBest(2n): threshold = the 2n-th best score; keep all >= it
        # (ties included, capacity-limited to 4n).
        n2 = min(2 * n_level, area)
        cand_ok = cand_ok & (v2 >= v2[n2 - 1])
    resp = jnp.where(cand_ok, resp, -jnp.inf)
    k1 = min(n_level, k2)
    v1, sel = jax.lax.top_k(resp, k1)
    ys = ys2[sel]
    xs = xs2[sel]
    valid = jnp.isfinite(v1)
    return ys, xs, jnp.where(valid, v1, 0.0), valid


def _select_level_keypoints(lvl: jax.Array, n_level: int, cfg: ORBConfig):
    """FAST -> border -> top-2n by FAST -> Harris -> top-n; plus angles.

    With cfg.retain_best_keep_ties, the stage-1 cut keeps FAST-score ties
    at the 2n-th value like cv::KeyPointsFilter::retainBest (orb.cpp uses
    retainBest(2n) before Harris ranking), within a fixed 4n candidate
    capacity.
    """
    h, w = lvl.shape
    k2 = min((4 if cfg.retain_best_keep_ties else 2) * n_level, h * w)

    if fast._use_pallas():
        # Fused Pallas pass: FAST+NMS+border+Harris+packed 2x1 pool in one
        # HBM round-trip; top_k then sorts a quarter-size int32 map with
        # identical ordering (score desc, index asc) — see ops/select_pallas.
        from tpu_vo.ops.select_pallas import fused_select_maps

        packed, harris_map, idx_bits = fused_select_maps(
            lvl, cfg.fast_threshold, cfg.edge_threshold)
        return _rank_from_maps(packed, harris_map, idx_bits, w, n_level,
                               cfg, h * w)
    else:
        score, keep = fast.detect(lvl, cfg.fast_threshold)
        keep = keep & _border_mask(h, w, cfg.edge_threshold)
        masked = jnp.where(keep, score, 0.0)
        v2, idx2 = jax.lax.top_k(masked.reshape(-1), k2)
        ys2 = idx2 // w
        xs2 = idx2 % w
        cand_ok = v2 > 0.0
        resp = harris.harris_at(lvl, ys2, xs2)

    if cfg.retain_best_keep_ties:
        # retainBest(2n): threshold = the 2n-th best score; keep all >= it
        # (ties included, capacity-limited to 4n).
        n2 = min(2 * n_level, h * w)
        cand_ok = cand_ok & (v2 >= v2[n2 - 1])
    resp = jnp.where(cand_ok, resp, -jnp.inf)
    k1 = min(n_level, k2)
    v1, sel = jax.lax.top_k(resp, k1)
    ys = ys2[sel]
    xs = xs2[sel]
    valid = jnp.isfinite(v1)
    return ys, xs, jnp.where(valid, v1, 0.0), valid


def detect_and_compute(img: jax.Array,
                       cfg: ORBConfig = ORBConfig()) -> ORBFeatures:
    """ORB features of a (H, W) grayscale image (uint8 or float32 0..255).

    Output slots are ordered by pyramid level (OpenCV emits keypoints in
    the same level order); within a level, by descending Harris response.

    Detection/ranking run per level (static Python loop, fixed shapes);
    orientation, Gaussian blur and the steered rBRIEF sampling all come
    from ONE (k1, 43, 43) window extraction per level via the
    patch-centric backend (features/patches.py) — random scalar gathers
    and full-frame cumsums/blurs are the TPU's weakest primitives, and
    profiling showed them to be ~75% of the frontend. Bit-identical to
    the dense formulation (tests/test_features.py::test_patch_backend).
    """
    img = img.astype(jnp.float32)
    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = features_per_level(cfg.n_features, cfg.n_levels,
                                 cfg.scale_factor)

    xs_all, ys_all, resp_all, ang_all, valid_all = [], [], [], [], []
    oct_all, size_all, scale_all, bits_all = [], [], [], []
    for level, (lvl, n_level) in enumerate(zip(levels, budgets)):
        if n_level <= 0:
            continue
        ys, xs, resp, valid = _select_level_keypoints(lvl, n_level, cfg)
        if fast._use_pallas():
            # DMA-based window extraction; rows [:43] bit-identical to
            # extract_patches and consumers only read those rows
            from tpu_vo.ops.patch_pallas import extract_patches_pallas
            raw = extract_patches_pallas(lvl, ys, xs)
        else:
            raw = patches.extract_patches(lvl, ys, xs)
        ang = patches.angles_from_patches(raw)
        bits_all.append(patches.descriptor_bits_from_patches(raw, ang))
        scale = float(cfg.scale_factor ** level)
        xs_all.append(xs)
        ys_all.append(ys)
        resp_all.append(resp)
        ang_all.append(ang)
        valid_all.append(valid)
        oct_all.append(jnp.full(xs.shape, level, dtype=jnp.int32))
        size_all.append(jnp.full(xs.shape, cfg.patch_size * scale,
                                 dtype=jnp.float32))
        scale_all.append(jnp.full(xs.shape, scale, dtype=jnp.float32))

    bits = jnp.concatenate(bits_all)         # (N, 256)

    xs = jnp.concatenate(xs_all)
    ys = jnp.concatenate(ys_all)
    scale = jnp.concatenate(scale_all)
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * scale[:, None]
    valid = jnp.concatenate(valid_all)
    desc_u8 = jnp.where(valid[:, None], brief.pack_bits_u8(bits), 0)
    desc_u32 = jnp.where(valid[:, None], brief.pack_bits_u32(bits), 0)

    return ORBFeatures(
        xy=jnp.where(valid[:, None], xy, 0.0),
        response=jnp.concatenate(resp_all),
        angle=jnp.where(valid, jnp.concatenate(ang_all), 0.0),
        octave=jnp.concatenate(oct_all),
        size=jnp.concatenate(size_all),
        desc=desc_u8,
        desc32=desc_u32,
        valid=valid,
    )
