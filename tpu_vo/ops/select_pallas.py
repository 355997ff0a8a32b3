"""Fused keypoint-selection Pallas kernel: FAST + NMS + border + Harris +
(score, index) packing + vertical max-pool in ONE pass over each level.

Replaces four separate XLA passes (16-image circle stack + FAST margins,
3x3 NMS, dense Harris, full-frame f32 flatten + top_k) whose honest
device-side cost was ~2.1 ms/frame on v5e, dominated not by arithmetic but
by HBM round-trips and the tiled->linear relayout that lax.top_k's 1-D
input forces on a (H, W) f32 map.

Per (ROW_TILE+8, W_pad) haloed row-band the kernel computes, entirely in
VMEM/registers:

  score   FAST-9/16 arc margins (tree-min shared across the 16 arcs)
  keep    strict-greater 3x3 NMS & edgeThreshold border & image bounds
  harris  OpenCV orb.cpp HarrisResponses (f32 Sobel + 7x7 box sums)
  packed  int32 (score << idx_bits) | (mask - brev(flat_idx)) for kept
          corners (brev = bit-reversed index, see _bit_reverse)
  pool    vertical 2-row max of `packed`

Packing gives descending-score order under a plain int32 sort, with ties
broken by ascending bit-reversed index — deterministic and spatially
uniform (see _bit_reverse for why plain index order is harmful). The 2x1
(plus a 1x2 XLA-side) max-pool is lossless: strict-greater 8-neighbor NMS
admits at most one survivor per 2x2 block, so top-k runs over a quarter
of the pixels in int32, with no relayout of the full-resolution map.

Reference parity: the FAST/Harris stages inside cv::ORB::detectAndCompute
(visual_odometry.cpp:113); numerics identical to features/fast.py +
features/harris.py (tests/test_pallas_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vo.features.fast import CIRCLE_OFFSETS

HALO = 4          # FAST circle (3) + NMS (1); Harris Sobel(1)+box(3) = 4
HARRIS_K = 0.04
HARRIS_BLOCK = 7


# Scoped-VMEM (kernel stack) limit handed to Mosaic. The default 16 MB
# cannot hold the arc-window form's peak (d[16] + pair tiles[16] +
# accumulators) at full 4K lane width even at the minimum 16-row tile
# (measured 17.31 MB at 16 x 3840). Selection runs one grid step per
# core at a time, so a bigger stack costs nothing — it just has to fit
# v5e's 128 MB physical VMEM alongside the in/out blocks and the DMA
# scratch bands.
_VMEM_LIMIT = 64 * 1024 * 1024


def _row_tile(w_pad: int) -> int:
    """Largest even-multiple-of-8 row tile whose in-kernel temporaries fit
    the raised scoped-VMEM limit. Mosaic's own stack-OOM reports give the
    arc-window form's peak: 17.31 MB at (16+2 rows x 3840 lanes) ~ 250
    bytes per (row, lane); budget 48 MB against the 64 MB _VMEM_LIMIT."""
    rows = int(48e6 / (w_pad * 250))
    # multiples of 16 so the packed (rt // 2)-row output block stays
    # 8-sublane aligned
    return max(16, min(64, ((rows - 2) // 16) * 16))


def _bit_reverse(x: jax.Array, bits: int) -> jax.Array:
    """Reverse the low `bits` bits of non-negative int32 x.

    Used as the tie-break key among equal FAST scores: descending-packed
    order then prefers ascending BIT-REVERSED index, which interleaves
    ties uniformly across the image. A plain ascending-index tie-break
    measurably biased kept ties toward the top rows at the retainBest
    cutoff and degraded pose conditioning (config-1 ATE 0.4% -> 2%);
    OpenCV's retainBest keeps ALL ties so has no such bias, and
    lax.top_k's unspecified order happened to interleave.
    """
    x = x.astype(jnp.uint32)
    m1 = jnp.uint32(0x55555555)
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    x = ((x & m1) << 1) | ((x >> 1) & m1)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    return (x >> (32 - bits)).astype(jnp.int32)


def _lane_rolls(tile, shifts):
    """{dx: tile rolled so that [r, c] = tile[r, c+dx]} via lane rotations.

    Wraparound garbage only reaches columns < HALO from either edge, all of
    which the edgeThreshold(31) border mask kills.
    """
    n = tile.shape[1]
    out = {}
    for dx in shifts:
        out[dx] = pltpu.roll(tile, (-dx) % n, 1) if dx else tile
    return out


def _select_kernel(img_ref, packed_ref, harris_ref, buf, sems, *,
                   threshold, h, w, w_pad, border, idx_bits, rt, b, n_bands,
                   with_harris=True):
    """img_ref: the whole padded (b, h_pad + 2*HALO, w_pad) f32 image in
    HBM (memory_space=ANY); outputs for the center rt rows of band r:
    packed (rt//2, w_pad) int32, harris (rt, w_pad) f32.

    The overlapping haloed row bands are fetched with double-buffered
    async DMA (same idiom as ops/patch_pallas) instead of a pre-stacked
    copy: BlockSpec index maps scale by the block shape, so overlapping
    reads cannot be expressed as input blocks, and the XLA-side stack
    used to cost 0.24 ms/frame of pure HBM write+read traffic
    (benchmarks/select_breakdown.json)."""
    bi = pl.program_id(0)
    r = pl.program_id(1)
    r0 = r * rt                             # first center row (global)

    def band_dma(bi_, r_, slot):
        # start row r_*rt is a multiple of rt (16-multiple); rt + 2*HALO
        # is a multiple of 8: both DMA-aligned
        return pltpu.make_async_copy(
            img_ref.at[bi_, pl.ds(r_ * rt, rt + 2 * HALO), :],
            buf.at[slot],
            sems.at[slot],
        )

    gstep = bi * n_bands + r                # global grid step
    slot = gstep % 2                        # weak-typed literal: stays int32 under x64

    @pl.when(gstep == 0)
    def _():
        band_dma(0, 0, 0).start()

    @pl.when(gstep + 1 < b * n_bands)
    def _():
        nxt_wraps = r + 1 >= n_bands
        r2 = jnp.where(nxt_wraps, 0, r + 1)
        bi2 = jnp.where(nxt_wraps, bi + 1, bi)
        band_dma(bi2, r2, (gstep + 1) % 2).start()

    band_dma(bi, r, slot).wait()
    raw = buf[slot]                         # (rt + 8, w_pad) f32

    # ---------------- FAST margins (f32 in-VMEM) ------------------------
    # (bf16 would halve VMEM traffic but Mosaic's lane-rotate requires
    # sublane counts that our 72-row haloed tiles don't satisfy in bf16;
    # in-VMEM f32 compute costs the same VPU throughput.)
    need_dx = sorted({dx for dx, _ in CIRCLE_OFFSETS} | {0})
    rolled = _lane_rolls(raw, need_dx)

    # scores for center rows +-1 (NMS halo): local rows [HALO-1, HALO+rt+1)
    s_lo, s_n = HALO - 1, rt + 2
    center = raw[s_lo:s_lo + s_n]
    d = []
    for dx, dy in CIRCLE_OFFSETS:
        shifted = rolled[dx][s_lo + dy:s_lo + dy + s_n]
        d.append(center - shifted)

    def arc_window(ds, op, combine):
        # circular 9-wide sliding-window reduce via shared pair tiles:
        # w2[k] = op(d[k], d[k+1]), then each 9-window is op of four w2
        # tiles + one d tile (80 elementwise passes vs 128 for the naive
        # per-arc form; the full doubling tree would need d+w2+w4 = 48
        # tiles live, which overflows scoped VMEM at full lane width —
        # this keeps at most d(16)+w2(16)+acc live).
        w2 = [op(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        out = None
        for k in range(16):
            m = op(op(w2[k], w2[(k + 2) % 16]),
                   op(w2[(k + 4) % 16], w2[(k + 6) % 16]))
            m = op(m, ds[(k + 8) % 16])
            out = m if out is None else combine(out, m)
        return out

    # dark: max over arcs of (min over the 9-arc window of d)
    dark = arc_window(d, jnp.minimum, jnp.maximum)
    # bright: max_k min_window(-d) == -(min_k max_window(d)) — computed
    # on d directly, saving 16 negation passes and 16 live tiles
    bright = -arc_window(d, jnp.maximum, jnp.minimum)
    margin = jnp.maximum(dark, bright)
    thr = jnp.float32(threshold)
    corner = margin > thr
    score = jnp.where(corner, jnp.maximum(margin, thr) - 1.0, 0.0)
    # (rt + 2, w_pad), rows shifted by -1 vs center rows

    # ---------------- strict 3x3 NMS on the center rows -----------------
    sc_rolled = _lane_rolls(score, (-1, 0, 1))
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neigh.append(sc_rolled[dx][1 + dy:1 + dy + rt])
    nmax = neigh[0]
    for x in neigh[1:]:
        nmax = jnp.maximum(nmax, x)
    sc_c = score[1:1 + rt]
    keep = corner[1:1 + rt]
    keep = keep & (sc_c > nmax)

    # ---------------- border / bounds mask ------------------------------
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (rt, w_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, w_pad), 1)
    inb = ((rows >= border) & (rows < h - border)
           & (cols >= border) & (cols < w - border))
    keep = keep & inb

    # ---------------- Harris response (f32) -----------------------------
    # ~35 of the kernel's ~130 VPU passes; computed while the band is
    # already resident, so its marginal HBM traffic is zero. with_harris
    # =False (A/B probes only) skips it to measure exactly that share.
    if with_harris:
        f_rolled = _lane_rolls(raw, (-1, 0, 1))
        # Sobel for rows [HALO-3, HALO+rt+3): box sum needs +-3
        b_lo, b_n = HALO - 3, rt + 6

        def at(dy, dx):
            return f_rolled[dx][b_lo + dy:b_lo + dy + b_n]

        Ix = ((at(0, 1) - at(0, -1)) * 2.0
              + (at(-1, 1) - at(-1, -1)) + (at(1, 1) - at(1, -1)))
        Iy = ((at(1, 0) - at(-1, 0)) * 2.0
              + (at(1, -1) - at(-1, -1)) + (at(1, 1) - at(-1, 1)))

        def box7(x):
            # accumulation order matches features/harris._box_sum exactly
            # (f32 adds don't reassociate): +d then -d, d = 1..3, per axis
            acc = x
            xr = _lane_rolls(x, (-3, -2, -1, 1, 2, 3))
            for dd in (1, 2, 3):
                acc = acc + xr[dd] + xr[-dd]
            out = acc[3:3 + rt]
            for dd in (1, 2, 3):
                out = (out
                       + acc[3 + dd:3 + dd + rt]
                       + acc[3 - dd:3 - dd + rt])
            return out

        a = box7(Ix * Ix)
        b_ = box7(Iy * Iy)
        c = box7(Ix * Iy)
        scale4 = jnp.float32((1.0 / ((1 << 2) * HARRIS_BLOCK * 255.0)) ** 4)
        harris_ref[0] = (a * b_ - c * c
                         - HARRIS_K * (a + b_) * (a + b_)) * scale4
    else:
        harris_ref[0] = jnp.zeros((rt, w_pad), jnp.float32)

    # ---------------- pack + vertical 2-row max-pool ---------------------
    flat_idx = rows * w + cols
    mask = jnp.int32((1 << idx_bits) - 1)
    key = mask - _bit_reverse(flat_idx, idx_bits)
    packed = jnp.where(
        keep,
        (sc_c.astype(jnp.int32) << idx_bits) | key,
        0,
    )
    p2 = packed.reshape(rt // 2, 2, w_pad)
    packed_ref[0] = jnp.maximum(p2[:, 0, :], p2[:, 1, :])


@functools.lru_cache(maxsize=None)
def _build_call(b, h, w, threshold, border, idx_bits, with_harris=True):
    w_pad = -(-w // 128) * 128
    rt = _row_tile(w_pad)
    h_even = h + (h % 2)
    h_pad = -(-h_even // rt) * rt
    grid = (b, h_pad // rt)

    n_bands = h_pad // rt
    kernel = functools.partial(
        _select_kernel, threshold=threshold, h=h, w=w, w_pad=w_pad,
        border=border, idx_bits=idx_bits, rt=rt, b=b, n_bands=n_bands,
        with_harris=with_harris,
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole padded image stays in HBM; the kernel DMAs each
            # overlapping haloed band itself (double-buffered)
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rt // 2, w_pad),
                         lambda bi, r: (bi, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt, w_pad),
                         lambda bi, r: (bi, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_pad // 2, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rt + 2 * HALO, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )

    def run(imgs):
        # halo rows top+bottom; right lane padding to the 128 multiple
        imgs_p = jnp.pad(
            imgs.astype(jnp.float32),
            ((0, 0), (HALO, h_pad - h + HALO), (0, w_pad - w)),
        )
        return call(imgs_p)

    return run


@functools.lru_cache(maxsize=None)
def _make_select_fn(h, w, threshold, border, idx_bits, with_harris=True):
    """custom_vmap wrapper routing jax.vmap onto the kernel's batch grid
    axis (the default Pallas vmap rule would put the batch inside the 2D
    block and break the (8, 128) tiling — and cannot batch the ANY-space
    HBM operand the DMA band fetch reads from at all).

    Nested vmaps (e.g. the DP runner's vmap over sequences on top of
    _chunked_map's vmap over frames) collapse recursively: the batched
    form `fb` is itself custom_vmap-wrapped, so each extra layer reshapes
    into the kernel's single batch axis instead of hitting the default
    Pallas batching rule."""

    @jax.custom_batching.custom_vmap
    def fb(imgs):                                     # (b, h, w)
        run = _build_call(imgs.shape[0], h, w, threshold, border, idx_bits,
                          with_harris)
        return run(imgs)

    @fb.def_vmap
    def _fb_rule(axis_size, in_batched, imgs):        # (axis, b, h, w)
        del in_batched
        b = imgs.shape[1]
        p, hr = fb(imgs.reshape(axis_size * b, h, w))
        return (p.reshape(axis_size, b, *p.shape[1:]),
                hr.reshape(axis_size, b, *hr.shape[1:])), (True, True)

    @jax.custom_batching.custom_vmap
    def f(img):
        p, hr = fb(img[None])
        return p[0], hr[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        del axis_size, in_batched
        return fb(img), (True, True)

    return f


def fused_select_maps(img: jax.Array, threshold: int, border: int,
                      with_harris: bool = True):
    """(packed, harris, idx_bits) for a (H, W) float32 level image.

    packed: (ceil(H/2) padded, W_pad) int32 — vertically max-pooled
      (score << idx_bits) | (m-1-idx) of NMS survivors inside the border;
      0 where no survivor.
    harris: (H padded, W_pad) f32 dense Harris response (valid inside the
      border; garbage near edges/padding).
    idx_bits decodes: score = v >> idx_bits,
      flat_idx = _bit_reverse(mask - (v & mask), idx_bits) with
      mask = (1 << idx_bits) - 1 (the key stores the complemented
      BIT-REVERSED flat index; see _bit_reverse for why).

    vmap-compatible over a leading frame axis.
    """
    h, w = img.shape[-2], img.shape[-1]
    idx_bits = max(1, (h * w - 1).bit_length())
    assert idx_bits + 9 <= 32, "image too large for packed selection"
    f = _make_select_fn(h, w, int(threshold), int(border), idx_bits,
                        bool(with_harris))
    packed, harris = f(img)
    return packed, harris, idx_bits
