"""ORB-style image pyramid with OpenCV-convention bilinear resize.

cv::ORB builds its pyramid by cascaded resizes: level L has size
(round(W / 1.2^L), round(H / 1.2^L)) and is produced by INTER_LINEAR
resize *from the previous level* (reference ORB config at
visual_odometry.cpp:65-73: nlevels=8, scaleFactor=1.2).

All level shapes are static functions of the input shape and config, so
the whole pyramid jit-compiles to a fixed graph. Resize uses OpenCV's
half-pixel-center convention src = (dst + 0.5) * scale - 0.5 with edge
clamping, computed in float32 and rounded to uint8 — within +-1 intensity
of OpenCV's fixed-point INTER_LINEAR, which downstream golden tests absorb.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def level_sizes(height: int, width: int, n_levels: int,
                scale_factor: float) -> List[Tuple[int, int]]:
    """Per-level (H, W) using OpenCV's cvRound(size / scale^level)."""
    sizes = []
    for level in range(n_levels):
        s = scale_factor ** level
        # cvRound = round-half-to-even, matching OpenCV
        h = int(round(height / s))
        w = int(round(width / s))
        sizes.append((h, w))
    return sizes


def level_scales(n_levels: int, scale_factor: float) -> List[float]:
    """Multiplier mapping level-L pixel coords back to level-0 coords."""
    return [scale_factor ** level for level in range(n_levels)]


def _resize_matrix(dst: int, src: int) -> np.ndarray:
    """(src, dst) interpolation matrix for one axis (OpenCV half-pixel
    convention, edge-clamped). Bilinear resize along an axis is a linear
    map, so it becomes a small static matmul — on TPU this runs on the
    MXU instead of lowering to lane-axis gathers (which are very slow).
    """
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x)
    w = x - x0
    w = np.where(x < 0, 0.0, w)  # OpenCV clamps the source coordinate
    i0 = np.clip(x0.astype(np.int64), 0, src - 1)
    i1 = np.clip(x0.astype(np.int64) + 1, 0, src - 1)
    M = np.zeros((src, dst), dtype=np.float32)
    np.add.at(M, (i0, np.arange(dst)), 1.0 - w)
    np.add.at(M, (i1, np.arange(dst)), w)
    return M


# Above this source size, the dense interpolation matmul switches to the
# block-banded form. Below it the dense matmul is already cheap and the
# extra HLO ops of tiling aren't worth it.
_BANDED_MIN_SRC = 256
_BAND_TILE = 128


def _banded_blocks(M: np.ndarray, tile: int):
    """Split a 2-tap interpolation matrix (src, dst) into per-output-tile
    banded blocks [(r0, block(rows, tile_cols)), ...].

    Each output column depends on <= 2 input rows and the mapping is
    monotone, so a `tile`-wide output block touches a contiguous
    ~tile*scale+2 input band. Multiplying only that band cuts FLOPs by
    ~src/(tile*scale) (24x for 3840->3200). The dropped terms are exact
    float zeros, so the result differs from the dense matmul only by
    the backend's FMA/reassociation choice for the smaller contraction
    (<= 1 ulp at intensity scale; absorbed by the +-1-intensity wobble
    budget the cv2 golden tests already allow).
    """
    src, dst = M.shape
    blocks = []
    for c0 in range(0, dst, tile):
        cols = M[:, c0:c0 + tile]
        nz = np.nonzero(cols.any(axis=1))[0]
        r0, r1 = int(nz[0]), int(nz[-1]) + 1
        blocks.append((r0, cols[r0:r1]))
    return blocks


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (H, W) or (..., H, W) images, uint8 or float.

    Implemented as two static matmuls (rows then columns) so the whole
    resize lands on the MXU. For large sources the dense (src, dst)
    interpolation matrix is applied block-banded (see _banded_blocks):
    dense form FLOPs grow as H*W*(H+W) — 175 GFLOP/frame at 4K, 2x
    super-linear in pixels — while the banded form stays linear.

    The matmuls are pinned to full-f32 precision: the TPU default
    (bf16-reduced operands) quantizes the resized PIXEL VALUES, and
    under low-contrast inputs (heavy motion blur) the resulting
    FAST/Harris keypoint shifts were the entire pan+harsh accuracy
    deficit of round 4 — per-pair rotation error 4.79 deg (default) vs
    1.70 (f32) on the blurred pan scene, with "high" (bf16x3) only a
    partial fix (2.65). Cost: 0.077 -> 0.112 ms/frame at 1241x376
    (~3% of the per-frame budget). Measured round 5; see
    docs/DESIGN.md "Pan+harsh root cause".
    """
    in_dtype = img.dtype
    h, w = img.shape[-2], img.shape[-1]
    x = img.astype(jnp.float32)

    Mr = _resize_matrix(out_h, h)   # (h, out_h)
    Mc = _resize_matrix(out_w, w)   # (w, out_w)

    with jax.default_matmul_precision("highest"):
        if h > _BANDED_MIN_SRC:
            out = jnp.concatenate(
                [jnp.einsum("ho,...hw->...ow", jnp.asarray(blk),
                            jax.lax.slice_in_dim(x, r0, r0 + blk.shape[0],
                                                 axis=-2))
                 for r0, blk in _banded_blocks(Mr, _BAND_TILE)], axis=-2)
        else:
            out = jnp.einsum("ho,...hw->...ow", jnp.asarray(Mr), x)

        if w > _BANDED_MIN_SRC:
            out = jnp.concatenate(
                [jnp.einsum("wo,...hw->...ho", jnp.asarray(blk),
                            jax.lax.slice_in_dim(out, r0,
                                                 r0 + blk.shape[0],
                                                 axis=-1))
                 for r0, blk in _banded_blocks(Mc, _BAND_TILE)], axis=-1)
        else:
            out = jnp.einsum("wo,...hw->...ho", jnp.asarray(Mc), out)

    if jnp.issubdtype(in_dtype, jnp.integer):
        info = jnp.iinfo(in_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max).astype(in_dtype)
    return out


def build_pyramid(img: jax.Array, n_levels: int,
                  scale_factor: float) -> List[jax.Array]:
    """Cascaded pyramid like cv::ORB: level L resized from level L-1.

    Returns a list of n_levels float32 images with static shapes. Each
    level is rounded to integral values to mirror OpenCV's uint8 cascade
    (detection thresholds compare integer intensities in OpenCV; rounding
    keeps our comparisons aligned), while staying float32 for the TPU
    compute path.
    """
    h, w = img.shape[-2], img.shape[-1]
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [img.astype(jnp.float32)]
    for level in range(1, n_levels):
        lh, lw = sizes[level]
        nxt = resize_bilinear(levels[-1], lh, lw)
        levels.append(jnp.clip(jnp.round(nxt), 0.0, 255.0))
    return levels
