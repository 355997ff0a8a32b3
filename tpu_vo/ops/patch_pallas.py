"""Pallas patch-extraction kernel: per-keypoint (43, 43) windows via
phase-shifted async DMA bands.

The XLA formulation (vmapped dynamic_slice, features/patches.py) costs
~1.6 ms/frame on v5e for 1200 keypoints — ~8x off the HBM bandwidth bound
— because XLA lowers it to a generic gather. Here each keypoint's window
is one (48, 128)-aligned HBM->VMEM DMA, with NSLOTS copies in flight so
DMA issue latency overlaps, compacted in-VMEM by a dynamic lane rotate
plus a 4-way predicated row dispatch.

DMA source slices must be (8, 128)-tile aligned in start AND shape, which
naively forces a (56, 256) band per 43x43 window (aligned start + worst
offset + window). Instead the wrapper materializes FOUR phase-shifted
copies of the level — row shifts {0, 4} x column shifts {0, 64} — and the
kernel picks the copy whose alignment brackets the keypoint, shrinking
the band to (48, 128): 2.4x less DMA traffic, row offset in [0, 4),
column offset in [0, 64). Round-3 probe (tools/patch_slots_probe.py,
4096 windows, 1241x376): 1.85 ms (old 2-slot (56, 256) kernel) ->
1.06 ms; the residual over the 0.83 ms DMA floor is the dynamic lane
rotate (~0.2 ms — cheaper alternatives measured worse: MXU one-hot
compaction 1.67 ms and only exact for integer images).

Keypoint coordinates arrive via scalar prefetch so DMA addresses are
available before the kernel body runs. Start-offset clamping matches
jax.lax.dynamic_slice exactly (start = clip(c - R, 0, dim - size)), so
rows [:43] are bit-identical to extract_patches for every slot, including
the garbage-but-deterministic invalid padded slots; rows [43:48] read
below-window image pixels or deterministic zeros (consumers never read
them — valid keypoints sit >= 31 px from borders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vo.features.patches import RAW_RADIUS, RAW_SIZE

KP_CHUNK = 32     # keypoints per grid step
NSLOTS = 16       # DMA buffers in flight (2 -> 16 measured 1.5x: the
                  # per-copy issue latency, not bandwidth, bounds the loop)
ROWS = 48         # sublane-aligned row count (>= RAW_SIZE, multiple of 8);
                  # rows RAW_SIZE..ROWS are below-window extras consumers
                  # never read
BAND_LANES = 128  # aligned lane span: with the 64-px column phase copy,
                  # offset < 64 and 64 + 43 <= 128
_ZROWS = 8        # zeroed scratch tail rows the 4-way dispatch may read


def _extract_kernel(ys_ref, xs_ref, img_ref, out_ref, scratch, sems, *,
                    h, w, n):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    k0 = ci * KP_CHUNK

    def offsets(j):
        k = jnp.minimum(k0 + j, n - 1)
        y = ys_ref[bi, k]
        x = xs_ref[bi, k]
        r0 = jnp.clip(y - RAW_RADIUS, 0, h - ROWS)
        c0 = jnp.clip(x - RAW_RADIUS, 0, w - RAW_SIZE)
        # phase copy (pr, pc) holds img shifted by (4*pr, 64*pc); choosing
        # pr = bit 2 of r0 and pc = bit 6 of c0 brackets the window with
        # an (8, 128)-aligned start in that copy
        pr = (r0 >> 2) & 1
        sr = ((r0 - 4 * pr) >> 3) << 3
        pc = (c0 >> 6) & 1
        sc = ((c0 - 64 * pc) >> 7) << 7
        return (pr, pl.multiple_of(sr, 8), r0 - 4 * pr - sr,
                pc, pl.multiple_of(sc, 128), c0 - 64 * pc - sc)

    def dma(j, slot):
        pr, sr, _, pc, sc, _ = offsets(j)
        return pltpu.make_async_copy(
            img_ref.at[bi, pr, pc, pl.ds(sr, ROWS), pl.ds(sc, BAND_LANES)],
            scratch.at[slot, pl.ds(0, ROWS)],
            sems.at[slot],
        )

    @pl.when((bi == 0) & (ci == 0))
    def _():
        # rows the dispatch can read past the DMA'd band (roff up to 3)
        for s in range(NSLOTS):
            scratch[s, ROWS:] = jnp.zeros((_ZROWS, BAND_LANES), jnp.float32)

    for j in range(min(NSLOTS, KP_CHUNK)):
        dma(j, j).start()
    for j in range(KP_CHUNK):
        slot = j % NSLOTS
        dma(j, slot).wait()
        _, _, roff, _, _, coff = offsets(j)
        band = pltpu.roll(scratch[slot], (BAND_LANES - coff) % BAND_LANES, 1)
        for rr in range(4):
            @pl.when(roff == rr)
            def _(rr=rr):
                out_ref[0, j] = band[rr:rr + ROWS, :RAW_SIZE]
        if j + NSLOTS < KP_CHUNK:
            dma(j + NSLOTS, slot).start()


@functools.lru_cache(maxsize=None)
def _build_call(b, h, w, n):
    n_pad = -(-n // KP_CHUNK) * KP_CHUNK
    grid = (b, n_pad // KP_CHUNK)

    hp = max(-(-h // 8) * 8, ROWS)
    wp = max(-(-w // 128) * 128, BAND_LANES)
    kernel = functools.partial(_extract_kernel, h=h, w=w, n=n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # ys, xs
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # phase copies in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, KP_CHUNK, ROWS, RAW_SIZE),
            lambda bi, ci, ys, xs: (bi, ci, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, ROWS + _ZROWS, BAND_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
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
                         ((0, 0), (0, hp + 4 - h), (0, wp + 64 - w)))
        copies = jnp.stack([
            jnp.stack([imgs_p[:, dr:dr + hp, dc:dc + wp]
                       for dc in (0, 64)], axis=1)
            for dr in (0, 4)], axis=1)           # (b, 2, 2, hp, wp)
        out = call(ys, xs, copies)
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
