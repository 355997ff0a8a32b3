"""FAST-9/16 corner detection as dense, vectorized score maps.

TPU-native equivalent of the FAST stage inside cv::ORB::detectAndCompute
(reference config: fastThreshold=10, visual_odometry.cpp:73). OpenCV walks
pixels with SIMD early-outs; on TPU the whole segment test is evaluated as
16 shifted copies of the image with masked circular-arc reductions — one
fused elementwise pipeline over the full frame, no data-dependent control
flow.

Score semantics replicate OpenCV's cornerScore<16> exactly:
  score = max(threshold, dark_margin, bright_margin) - 1, where
  dark_margin  = max over 16 arcs of min over 9 consecutive (v - c_i),
  bright_margin = max over 16 arcs of min over 9 consecutive (c_i - v),
and a pixel is a corner iff max(dark, bright) > threshold. Non-max
suppression keeps corners whose score is strictly greater than all 8
neighbors (non-corner neighbors count as 0), matching cv::FAST(nonmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, OpenCV's makeOffsets order: (dx, dy) with
# x = column, y = row (y grows downward).
CIRCLE_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)

ARC_LEN = 9  # FAST-9: at least 9 contiguous pixels


def _circle_stack(img: jax.Array) -> jax.Array:
    """(16, H, W): circle pixel values c_i at every center position."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(-2, -1)) for dx, dy in CIRCLE_OFFSETS],
        axis=0,
    )


def _arc_margin(d_ext: jax.Array) -> jax.Array:
    """max over the 16 circular arcs of (min over ARC_LEN consecutive d).

    d_ext is (24, H, W): the 16 diffs plus the first 8 repeated so every
    window of 9 stays in-bounds.
    """
    m = d_ext
    for j in range(1, ARC_LEN):
        m = jnp.minimum(m, jnp.roll(d_ext, -j, axis=0))
    return jnp.max(m[:16], axis=0)


def fast_score_map(img: jax.Array, threshold: int):
    """Dense FAST-9/16 response.

    Args:
      img: (H, W) float32 grayscale on an integral grid (0..255).
      threshold: FAST intensity threshold (reference: 10).
    Returns:
      score: (H, W) float32 — OpenCV cornerScore at corners, 0 elsewhere.
      corner: (H, W) bool — segment-test corners (before NMS), with the
        3-pixel border excluded.
    """
    h, w = img.shape[-2], img.shape[-1]
    thr = jnp.asarray(threshold, img.dtype)

    circ = _circle_stack(img)
    d = img[None] - circ                         # (16, H, W)
    d_ext = jnp.concatenate([d, d[:8]], axis=0)  # (24, H, W)

    dark = _arc_margin(d_ext)
    bright = _arc_margin(-d_ext)
    margin = jnp.maximum(dark, bright)

    corner = margin > thr
    row = jnp.arange(h)
    col = jnp.arange(w)
    interior = (
        (row[:, None] >= 3) & (row[:, None] < h - 3)
        & (col[None, :] >= 3) & (col[None, :] < w - 3)
    )
    corner = corner & interior

    score = jnp.maximum(margin, thr) - 1.0
    score = jnp.where(corner, score, 0.0)
    return score, corner


def nonmax_suppress(score: jax.Array, corner: jax.Array):
    """3x3 strict-greater NMS on the corner score map (cv::FAST semantics)."""
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neigh.append(jnp.roll(score, (-dy, -dx), axis=(-2, -1)))
    nmax = jnp.stack(neigh, axis=0).max(axis=0)
    return corner & (score > nmax)


def _use_pallas() -> bool:
    """Use the Pallas kernel on accelerator backends (bit-identical to the
    XLA formulation — see tests); pure-XLA on CPU, where Mosaic kernels
    would need interpret mode."""
    import jax as _jax

    return _jax.default_backend() != "cpu"


def detect(img: jax.Array, threshold: int, nonmax: bool = True):
    """Full FAST detection: (score, keep) maps."""
    if _use_pallas():
        from tpu_vo.ops.fast_pallas import fast_margin_pallas

        score, corner = fast_margin_pallas(img, threshold)
    else:
        score, corner = fast_score_map(img, threshold)
    keep = nonmax_suppress(score, corner) if nonmax else corner
    return score, keep
