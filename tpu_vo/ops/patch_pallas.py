"""Pallas patch-extraction kernel: per-keypoint (43, 43) windows via
double-buffered async DMA.

The XLA formulation (vmapped dynamic_slice, features/patches.py) costs
~1.6 ms/frame on v5e for 1200 keypoints — ~8x off the HBM bandwidth bound
— because XLA lowers it to a generic gather. Here each keypoint's window
is one strided HBM->VMEM DMA of (PS, WN) rows (WN = lane-aligned span
covering the window), double-buffered so the next copy flies while the
current window is compacted to (PS, PS) with an in-VMEM dynamic lane
slice.

Keypoint coordinates arrive via scalar prefetch so DMA addresses are
available before the kernel body runs. Start-offset clamping matches
jax.lax.dynamic_slice exactly (start = clip(c - R, 0, dim - PS)), so the
output is bit-identical to extract_patches for every slot, including the
garbage-but-deterministic invalid padded slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vo.features.patches import RAW_RADIUS, RAW_SIZE

KP_CHUNK = 8      # keypoints per grid step
ROWS = 48         # sublane-aligned row count (>= RAW_SIZE, multiple of 8);
                  # rows RAW_SIZE..ROWS are below-window extras consumers
                  # never read (valid keypoints sit >= 31 px from borders,
                  # so the taller window stays in-bounds)
BAND_ROWS = 56    # aligned DMA band: 8-aligned start + max offset 8 + 48
BAND_LANES = 256  # aligned lane span: 128-aligned start + offset + 43


def _extract_kernel(ys_ref, xs_ref, img_ref, out_ref, scratch, sems, *,
                    h, w, n, hp):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    k0 = ci * KP_CHUNK

    def offsets(j):
        k = jnp.minimum(k0 + j, n - 1)
        y = ys_ref[bi, k]
        x = xs_ref[bi, k]
        r0 = jnp.clip(y - RAW_RADIUS, 0, h - ROWS)
        c0 = jnp.clip(x - RAW_RADIUS, 0, w - RAW_SIZE)
        # DMA slices must be (8, 128)-tile aligned in start AND shape, so
        # copy an aligned (BAND_ROWS, BAND_LANES) band and compact inside
        # VMEM: dynamic lane rotate + a 9-way predicated row dispatch.
        r8 = jnp.clip((r0 // 8) * 8, 0, max(hp - BAND_ROWS, 0))
        c128 = (c0 // 128) * 128
        return (pl.multiple_of(r8, 8), r0 - r8,
                pl.multiple_of(c128, 128), c0 - c128)

    def dma(j, slot):
        r8, _, c128, _ = offsets(j)
        return pltpu.make_async_copy(
            img_ref.at[bi, pl.ds(r8, BAND_ROWS), pl.ds(c128, BAND_LANES)],
            scratch.at[slot],
            sems.at[slot],
        )

    dma(0, 0).start()
    for j in range(KP_CHUNK):
        slot = j % 2
        if j + 1 < KP_CHUNK:
            dma(j + 1, (j + 1) % 2).start()
        dma(j, slot).wait()
        _, roff, _, coff = offsets(j)
        band = pltpu.roll(scratch[slot], (BAND_LANES - coff) % BAND_LANES, 1)
        for rr in range(9):
            @pl.when(roff == rr)
            def _(rr=rr):
                out_ref[0, j] = band[rr:rr + ROWS, :RAW_SIZE]


@functools.lru_cache(maxsize=None)
def _build_call(b, h, w, n):
    n_pad = -(-n // KP_CHUNK) * KP_CHUNK
    grid = (b, n_pad // KP_CHUNK)

    hp = max(-(-h // 8) * 8, BAND_ROWS)
    wp = (-(-w // 128) + 1) * 128           # one extra lane block so the
                                            # aligned 256-span never runs out
    kernel = functools.partial(_extract_kernel, h=h, w=w, n=n, hp=hp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # ys, xs
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # whole image in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, KP_CHUNK, ROWS, RAW_SIZE),
            lambda bi, ci, ys, xs: (bi, ci, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BAND_ROWS, BAND_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ROWS, RAW_SIZE),
                                       jnp.float32),
    )

    def run(imgs, ys, xs):
        imgs_p = jnp.pad(imgs.astype(jnp.float32),
                         ((0, 0), (0, hp - h), (0, wp - w)))
        out = call(ys, xs, imgs_p)
        return out[:, :n]

    return run


@functools.lru_cache(maxsize=None)
def _make_fn(h, w, n):
    # Batched form is itself custom_vmap-wrapped so stacked vmaps
    # (sequences x frames in the DP runner) collapse into the kernel's
    # batch grid axis — the ANY-space HBM image operand cannot be batched
    # by the default Pallas rule. Mirrors select_pallas._make_select_fn.
    @jax.custom_batching.custom_vmap
    def fb(imgs, ys, xs):                             # (b, h, w), (b, n)x2
        return _build_call(imgs.shape[0], h, w, n)(imgs, ys, xs)

    @fb.def_vmap
    def _fb_rule(axis_size, in_batched, imgs, ys, xs):
        del in_batched
        b = imgs.shape[1]
        out = fb(imgs.reshape(axis_size * b, h, w),
                 ys.reshape(axis_size * b, n),
                 xs.reshape(axis_size * b, n))
        return out.reshape(axis_size, b, *out.shape[1:]), True

    @jax.custom_batching.custom_vmap
    def f(img, ys, xs):
        return fb(img[None], ys[None], xs[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, img, ys, xs):
        del axis_size, in_batched
        return fb(img, ys, xs), True

    return f


def extract_patches_pallas(lvl: jax.Array, ys: jax.Array,
                           xs: jax.Array) -> jax.Array:
    """(N, 48, 43) raw windows; rows [:43] are bit-identical to
    patches.extract_patches for every keypoint >= 31 px inside the image
    (rows 43..47 are extra below-window pixels consumers never read).

    vmap-compatible over a leading frame axis.

    Levels smaller than the DMA window (h < ROWS or w < RAW_SIZE) fall
    back to the XLA path: the kernel's clamped band offsets would go
    negative there and leave output blocks uninitialized.
    """
    h, w = lvl.shape[-2], lvl.shape[-1]
    n = ys.shape[-1]
    if h < ROWS or w < RAW_SIZE:
        from tpu_vo.features.patches import extract_patches

        raw = extract_patches(lvl, ys, xs)      # (..., N, RAW_SIZE, RAW_SIZE)
        pad = [(0, 0)] * (raw.ndim - 2) + [(0, ROWS - RAW_SIZE), (0, 0)]
        return jnp.pad(raw, pad)
    return _make_fn(h, w, n)(lvl, ys.astype(jnp.int32), xs.astype(jnp.int32))
