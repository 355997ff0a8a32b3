"""Pallas TPU kernel for the FAST-9/16 arc-margin computation.

The XLA formulation in features/fast.py materializes a (24, H, W) stack
and rolls it 16 times; this kernel instead computes, per (H, 128) lane
tile, the 16 circle diffs and all 16 nine-long circular arc minima with a
tree of mins (min2 -> min4 -> min8 -> min9), entirely in VMEM:

    dark  = max_k min(d[k..k+8]),  bright = max_k min(-d[k..k+8]),
    score = max(thr, dark, bright) - 1,  corner = max margin > thr,

identical numerics to features/fast.py (and therefore bit-exact with
cv::FAST scores, see tests/test_features.py and test_pallas_ops.py).

The 16 shifted circle images are built by XLA (concat-of-slices rolls are
cheap); the kernel fuses the ~170 elementwise ops per pixel that dominate.
The kernel is natively batched over a leading frame axis (grid dim), and a
custom_vmap rule routes jax.vmap onto that axis — Pallas's default vmap
rule would otherwise place the batch dimension inside the 2D block and
violate the (8, 128) tiling constraint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vo.features.fast import CIRCLE_OFFSETS

# (16, ROW_TILE, LANE_TILE) f32 input block + the tree-min temporaries must
# fit in ~16MB VMEM (the temps are ~4x the input block).
LANE_TILE = 128
ROW_TILE = 96


def _margin_kernel(img_ref, circ_ref, score_ref, corner_ref, *, threshold):
    v = img_ref[0]                        # (H, TILE)
    d = [v - circ_ref[0, k] for k in range(16)]

    def arc_max_min(ds):
        # min over 9 consecutive (circular) via shared tree reductions
        min2 = [jnp.minimum(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        min4 = [jnp.minimum(min2[k], min2[(k + 2) % 16]) for k in range(16)]
        min8 = [jnp.minimum(min4[k], min4[(k + 4) % 16]) for k in range(16)]
        min9 = [jnp.minimum(min8[k], ds[(k + 8) % 16]) for k in range(16)]
        out = min9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, min9[k])
        return out

    dark = arc_max_min(d)
    bright = arc_max_min([-x for x in d])
    # Comparisons/selects in f32: this Mosaic target rejects bf16 cmpf.
    # All values are integers <= 255, exactly representable either way.
    margin = jnp.maximum(dark, bright).astype(jnp.float32)
    thr = jnp.asarray(threshold, jnp.float32)
    corner = margin > thr
    score = jnp.where(corner, jnp.maximum(margin, thr) - 1.0, 0.0)
    score_ref[0] = score.astype(score_ref.dtype)
    corner_ref[0] = corner


def _margin_call(imgs: jax.Array, threshold: int):
    """(B, H, W) -> (score, corner); score in the input dtype.

    Internally runs in bfloat16: pyramid levels are integral-valued
    (0..255), and integers up to 256, their differences, mins/maxes and
    the score (margin - 1) are all exactly representable in bfloat16 —
    results are bit-identical to the float32 path while the dominant
    (16, H, W) circle-stack traffic is halved.
    """
    in_dtype = imgs.dtype
    b, h, w = imgs.shape
    imgs = imgs.astype(jnp.bfloat16)
    circ = jnp.stack(
        [jnp.roll(imgs, (-dy, -dx), axis=(-2, -1))
         for dx, dy in CIRCLE_OFFSETS],
        axis=1,
    )  # (B, 16, H, W)

    w_pad = -(-w // LANE_TILE) * LANE_TILE
    h_pad = -(-h // ROW_TILE) * ROW_TILE
    if (w_pad, h_pad) != (w, h):
        imgs_p = jnp.pad(imgs, ((0, 0), (0, h_pad - h), (0, w_pad - w)))
        circ_p = jnp.pad(circ, ((0, 0), (0, 0), (0, h_pad - h),
                                (0, w_pad - w)))
    else:
        imgs_p, circ_p = imgs, circ

    grid = (b, h_pad // ROW_TILE, w_pad // LANE_TILE)
    score, corner = pl.pallas_call(
        functools.partial(_margin_kernel, threshold=threshold),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROW_TILE, LANE_TILE),
                         lambda bi, r, i: (bi, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, ROW_TILE, LANE_TILE),
                         lambda bi, r, i: (bi, 0, r, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_TILE, LANE_TILE),
                         lambda bi, r, i: (bi, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE, LANE_TILE),
                         lambda bi, r, i: (bi, r, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_pad, w_pad), imgs.dtype),
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.bool_),
        ],
    )(imgs_p, circ_p)
    if (w_pad, h_pad) != (w, h):
        score = score[:, :h, :w]
        corner = corner[:, :h, :w]
    return score.astype(in_dtype), corner


@functools.lru_cache(maxsize=None)
def _make_margin_fn(threshold: int):
    # Batched form is itself custom_vmap-wrapped so nested vmaps collapse
    # into the kernel batch axis (see select_pallas._make_select_fn).
    @jax.custom_batching.custom_vmap
    def fb(imgs):
        return _margin_call(imgs, threshold)

    @fb.def_vmap
    def _fb_rule(axis_size, in_batched, imgs):
        del in_batched
        b, h, w = imgs.shape[1], imgs.shape[2], imgs.shape[3]
        s, c = fb(imgs.reshape(axis_size * b, h, w))
        return (s.reshape(axis_size, b, h, w),
                c.reshape(axis_size, b, h, w)), (True, True)

    @jax.custom_batching.custom_vmap
    def f(img):
        s, c = fb(img[None])
        return s[0], c[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        del axis_size, in_batched
        return fb(img), (True, True)

    return f


def fast_margin_pallas(img: jax.Array, threshold: int):
    """(score, corner) maps for a (H, W) float32 image via Pallas.

    Matches features/fast.fast_score_map exactly, including the 3-pixel
    border exclusion.
    """
    h, w = img.shape[-2], img.shape[-1]
    score, corner = _make_margin_fn(int(threshold))(img)

    # exclude the 3-pixel border (roll wraparound), like features/fast.py
    row = jnp.arange(h)
    col = jnp.arange(w)
    interior = (
        (row[:, None] >= 3) & (row[:, None] < h - 3)
        & (col[None, :] >= 3) & (col[None, :] < w - 3)
    )
    corner = corner & interior
    score = jnp.where(corner, score, 0.0)
    return score, corner
