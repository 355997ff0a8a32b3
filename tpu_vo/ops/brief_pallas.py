"""Pallas TPU kernel for steered rBRIEF descriptor sampling.

XLA lowers the (N, 512) image gather in features/brief.py to a slow
per-element gather (~5 ms/frame). This kernel restructures sampling as
MXU work:

  per chunk of K keypoints:
    - K async DMAs copy each keypoint's (ROWS x 128) neighborhood from the
      blurred image in HBM into VMEM (the 128-lane window always contains
      the rotated 39x39 sample support);
    - row selection becomes a one-hot (512, ROWS) @ (ROWS, 128) matmul on
      the MXU; column selection a masked lane reduction — no gathers;
    - descriptor bits are bit[k] = v[2k] < v[2k+1], packed to uint32 lanes
      by an 8x32 weighted reduction.

All arithmetic is in bfloat16/float32 on integral pixel values <= 255, so
results are bit-identical to features/brief.descriptor_bits (tested in
interpret mode and on device).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vo.features.brief import steered_offsets

# Window sizes are chosen so that an 8-aligned row origin and 128-aligned
# column origin (Mosaic requires tile-aligned DMA slice offsets) still
# cover the rotated 39x39 sample support PLUS the 7x7 Gaussian blur halo
# for any interior keypoint (origins use a -22 bias: y - y0 in [22, 29],
# x - x0 in [22, 149]; max local sample 149 + 19 + 3 = 171 < 256).
ROWS = 56        # rows DMA'd per keypoint
LANES = 256      # lane window
CHUNK = 8        # keypoints per program
_BIAS = 22       # 19 (rotated support) + 3 (blur halo)


def _sample(patches_bf16, dyl, dxl):
    """(CHUNK, 256) sampled values via one-hot MXU row select + lane mask."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256, ROWS), 2)
    rsel = (row_iota == dyl[..., None]).astype(jnp.bfloat16)
    tmp = jax.lax.dot_general(
        rsel, patches_bf16,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                    # (CHUNK, 256, LANES)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256, LANES), 2)
    csel = (col_iota == dxl[..., None]).astype(jnp.float32)
    return jnp.sum(tmp * csel, axis=2)   # (CHUNK, 256)


def _blur_windows(raw: jax.Array) -> jax.Array:
    """7x7 sigma=2 Gaussian on (CHUNK, ROWS, LANES) windows, matching
    image/filters.gaussian_blur exactly for interior positions (columns
    first, then rows, float32, rounded to the integral grid). Border
    positions of each window are wrong but lie outside the sample support
    by construction of the _BIAS window layout."""
    from tpu_vo.image.filters import gaussian_kernel_1d

    k = gaussian_kernel_1d(7, 2.0).astype(np.float32)
    x = raw
    acc = x * k[3]
    for i in range(1, 4):
        # pltpu.roll requires non-negative shifts; size-i == -i circularly
        acc += (pltpu.roll(x, LANES - i, 2) + pltpu.roll(x, i, 2)) * k[3 + i]
    x = acc
    acc = x * k[3]
    for i in range(1, 4):
        acc += (pltpu.roll(x, ROWS - i, 1) + pltpu.roll(x, i, 1)) * k[3 + i]
    return jnp.round(acc)


def _kernel(y0_ref, x0_ref, img_ref, dyl0_ref, dxl0_ref, dyl1_ref, dxl1_ref,
            out_ref, patches, sem):
    b = pl.program_id(0)
    k = pl.program_id(1)

    # DMA the CHUNK patches for this program (start all, then wait all).
    copies = []
    for i in range(CHUNK):
        y0 = pl.multiple_of(y0_ref[b, k * CHUNK + i], 8)
        x0 = pl.multiple_of(x0_ref[b, k * CHUNK + i], 128)
        c = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y0, ROWS), pl.ds(x0, LANES)],
            patches.at[i],
            sem.at[i],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    pb = _blur_windows(patches[:]).astype(jnp.bfloat16)
    v0 = _sample(pb, dyl0_ref[0], dxl0_ref[0])   # first point of each pair
    v1 = _sample(pb, dyl1_ref[0], dxl1_ref[0])   # second point
    bits = (v0 < v1).astype(jnp.int32)           # (CHUNK, 256)
    lanes = bits.reshape(CHUNK, 8, 32)
    # int32 packing (Mosaic lacks unsigned reductions); bit 31 survives via
    # bitcast to uint32 at the end.
    weights = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 8, 32), 2))
    packed = jnp.sum(lanes * weights, axis=2, dtype=jnp.int32)
    out_ref[0] = pltpu.bitcast(packed, jnp.uint32)


def _descriptor_call(img: jax.Array, ys: jax.Array, xs: jax.Array,
                     angles_deg: jax.Array) -> jax.Array:
    """Natively batched kernel launch: raw (B,H,W), (B,N) -> (B,N,8)."""
    bsz, h, w = img.shape
    n = ys.shape[-1]

    dy, dx = steered_offsets(angles_deg.reshape(-1))    # (B*N, 512)
    dy = dy.reshape(bsz, n, 512)
    dx = dx.reshape(bsz, n, 512)
    # Tile-aligned window origins (8 rows / 128 lanes). The image is padded
    # below so that any aligned window fits entirely — clipping an origin
    # would silently break the alignment contract given to the compiler.
    y0 = jnp.maximum(((ys - _BIAS) // 8) * 8, 0)
    x0 = jnp.maximum(((xs - _BIAS) // 128) * 128, 0)
    # local coordinates inside the DMA'd window, clamped like the XLA path
    dyl = jnp.clip(ys[..., None] + dy, 0, h - 1) - y0[..., None]
    dxl = jnp.clip(xs[..., None] + dx, 0, w - 1) - x0[..., None]
    dyl = jnp.clip(dyl, 0, ROWS - 1).astype(jnp.int32)
    dxl = jnp.clip(dxl, 0, LANES - 1).astype(jnp.int32)

    h_pad = -(-(h + ROWS) // 8) * 8
    w_pad = -(-(w + LANES) // 128) * 128
    img = jnp.pad(img.astype(jnp.float32),
                  ((0, 0), (0, h_pad - h), (0, w_pad - w)))

    spec = pl.BlockSpec((1, CHUNK, 256), lambda b, k, y0, x0: (b, k, 0),
                        memory_space=pltpu.VMEM)
    grid = (bsz, n // CHUNK)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                # Image pinned to HBM: VMEM-resident sources would force
                # 8/128-aligned DMA slice offsets; HBM allows arbitrary
                # per-keypoint window origins.
                pl.BlockSpec(memory_space=pltpu.HBM),
                spec, spec, spec, spec,
            ],
            out_specs=pl.BlockSpec((1, CHUNK, 8),
                                   lambda b, k, y0, x0: (b, k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((CHUNK, ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((CHUNK,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 8), jnp.uint32),
    )(y0.astype(jnp.int32), x0.astype(jnp.int32),
      img.astype(jnp.float32),
      dyl[..., 0::2], dxl[..., 0::2], dyl[..., 1::2], dxl[..., 1::2])
    return out


@jax.custom_batching.custom_vmap
def _descriptor_single(img, ys, xs, angles_deg):
    return _descriptor_call(img[None], ys[None], xs[None],
                            angles_deg[None])[0]


@_descriptor_single.def_vmap
def _descriptor_vmap_rule(axis_size, in_batched, img, ys, xs, angles_deg):
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

    args = [bc(a, b) for a, b in zip((img, ys, xs, angles_deg), in_batched)]
    return _descriptor_call(*args), True


def descriptor_bits_pallas(img: jax.Array, ys: jax.Array, xs: jax.Array,
                           angles_deg: jax.Array) -> jax.Array:
    """(N, 8) uint32 descriptor lanes for arbitrary N on a RAW (H, W) image.

    The 7x7 sigma=2 Gaussian blur is fused into the kernel (applied to
    each keypoint window, not the full image). Equivalent to
    pack_bits_u32(descriptor_bits(gaussian_blur(img), ...)).
    """
    h, w = img.shape[-2], img.shape[-1]
    if h < ROWS or w < LANES:
        # Small pyramid levels: aligned windows don't fit; the XLA path
        # is cheap at these sizes (few keypoints, small image).
        from tpu_vo.features.brief import descriptor_bits, pack_bits_u32
        from tpu_vo.image.filters import gaussian_blur

        return pack_bits_u32(
            descriptor_bits(gaussian_blur(img), ys, xs, angles_deg))
    n = ys.shape[0]
    n_pad = -(-n // CHUNK) * CHUNK
    if n_pad != n:
        pad = n_pad - n
        ys = jnp.concatenate([ys, jnp.full(pad, h // 2, ys.dtype)])
        xs = jnp.concatenate([xs, jnp.full(pad, w // 2, xs.dtype)])
        angles_deg = jnp.concatenate(
            [angles_deg, jnp.zeros(pad, angles_deg.dtype)])
        return _descriptor_single(img, ys, xs, angles_deg)[:n]
    return _descriptor_single(img, ys, xs, angles_deg)
