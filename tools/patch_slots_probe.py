"""Probe: patch-extraction DMA variants — in-flight slot count / chunking.

The round-2 kernel issued one (56, 256)-f32 strided DMA per keypoint,
double-buffered (2 slots). At 1200 kps it measured ~187 GB/s effective —
far from the v5e HBM bound — suggesting DMA latency, not bandwidth,
limits it. This probe rebuilds the kernel with NSLOTS in-flight copies
and KP_CHUNK keypoints per grid step and times each variant on bench
shapes; its findings (16 slots, 32-kp chunks, 1.85 -> 1.06 ms per 4096
windows with the phase-shifted (48, 128) bands) are now the production
design in ops/patch_pallas.py.

Usage: python tools/patch_slots_probe.py  (on the TPU host)
Env: REPS (default 64).
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from tools.device_time import device_time_ms
from tpu_vo.features.patches import RAW_RADIUS, RAW_SIZE
from tpu_vo.ops.patch_pallas import ROWS
BAND_ROWS, BAND_LANES = 56, 256   # the retired v1 band geometry this probe sweeps
from tpu_vo.ops import patch_pallas


def _kernel(ys_ref, xs_ref, img_ref, out_ref, scratch, sems, *,
            h, w, n, hp, kp_chunk, nslots, compact=True, lanes=BAND_LANES):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    k0 = ci * kp_chunk

    def offsets(j):
        k = jnp.minimum(k0 + j, n - 1)
        y = ys_ref[bi, k]
        x = xs_ref[bi, k]
        r0 = jnp.clip(y - RAW_RADIUS, 0, h - ROWS)
        c0 = jnp.clip(x - RAW_RADIUS, 0, w - RAW_SIZE)
        r8 = jnp.clip((r0 // 8) * 8, 0, max(hp - BAND_ROWS, 0))
        c128 = (c0 // 128) * 128
        return (pl.multiple_of(r8, 8), r0 - r8,
                pl.multiple_of(c128, 128), c0 - c128)

    def dma(j, slot):
        r8, _, c128, _ = offsets(j)
        c128 = pl.multiple_of(
            jnp.minimum(c128, ((w // 128) + 1) * 128 - lanes), 128)
        return pltpu.make_async_copy(
            img_ref.at[bi, pl.ds(r8, BAND_ROWS), pl.ds(c128, lanes)],
            scratch.at[slot],
            sems.at[slot],
        )

    for j in range(min(nslots, kp_chunk)):
        dma(j, j).start()
    for j in range(kp_chunk):
        slot = j % nslots
        dma(j, slot).wait()
        _, roff, _, coff = offsets(j)
        if compact:
            band = pltpu.roll(scratch[slot], (lanes - coff) % lanes, 1)
            for rr in range(9):
                @pl.when(roff == rr)
                def _(rr=rr):
                    out_ref[0, j] = band[rr:rr + ROWS, :RAW_SIZE]
        else:
            out_ref[0, j] = scratch[slot][:ROWS, :RAW_SIZE]
        if j + nslots < kp_chunk:
            dma(j + nslots, slot).start()


@functools.lru_cache(maxsize=None)
def build(b, h, w, n, kp_chunk, nslots, compact=True, lanes=BAND_LANES):
    n_pad = -(-n // kp_chunk) * kp_chunk
    grid = (b, n_pad // kp_chunk)
    hp = max(-(-h // 8) * 8, BAND_ROWS)
    wp = (-(-w // 128) + 1) * 128
    kernel = functools.partial(_kernel, h=h, w=w, n=n, hp=hp,
                               kp_chunk=kp_chunk, nslots=nslots,
                               compact=compact, lanes=lanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, kp_chunk, ROWS, RAW_SIZE),
            lambda bi, ci, ys, xs: (bi, ci, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, BAND_ROWS, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ROWS, RAW_SIZE),
                                       jnp.float32),
    )

    def run(imgs, ys, xs):
        imgs_p = jnp.pad(imgs.astype(jnp.float32),
                         ((0, 0), (0, hp - h), (0, wp - w)))
        return call(ys, xs, imgs_p)[:, :n]

    return run


def main():
    reps = int(os.environ.get("REPS", "64"))
    b, h, w, n = 8, 376, 1241, 512
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, size=(b, h, w)), jnp.float32)
    ys = jnp.asarray(rng.integers(31, h - 31, size=(b, n)), jnp.int32)
    xs = jnp.asarray(rng.integers(31, w - 31, size=(b, n)), jnp.int32)

    base = jax.jit(jax.vmap(patch_pallas.extract_patches_pallas))
    t0 = device_time_ms(base, imgs, ys, xs, reps=reps)
    ref_out = np.asarray(base(imgs, ys, xs))
    print(f"production (chunk=8, slots=2): {t0:7.3f} ms "
          f"({b*n} windows, {b*n*BAND_ROWS*BAND_LANES*4/t0/1e6:.0f} GB/s)")

    for kp_chunk, nslots, compact, lanes in (
            (8, 2, True, 256), (8, 4, True, 256), (8, 8, True, 256),
            (16, 4, True, 256), (16, 8, True, 256), (16, 16, True, 256),
            (32, 8, True, 256), (32, 16, True, 256), (32, 32, True, 256),
            (32, 16, False, 256),   # DMA+fixed-write only (no compaction)
            (32, 16, False, 128),   # half-lane band: traffic-scaling probe
            (32, 16, True, 512),    # double-lane band: inverse probe
    ):
        fn = build(b, h, w, n, kp_chunk, nslots, compact, lanes)
        jfn = jax.jit(fn)
        out = np.asarray(jfn(imgs, ys, xs))
        ok = bool((out == ref_out).all())
        t = device_time_ms(jfn, imgs, ys, xs, reps=reps)
        print(f"chunk={kp_chunk:2d} slots={nslots:2d} compact={int(compact)} "
              f"lanes={lanes}: {t:7.3f} ms  "
              f"({b*n*BAND_ROWS*lanes*4/t/1e6:4.0f} GB/s)  match={ok}")

    for kp_chunk, nslots in ((16, 8), (32, 8), (32, 16)):
        fn = build_v2(b, h, w, n, kp_chunk, nslots)
        jfn = jax.jit(fn)
        out = np.asarray(jfn(imgs, ys, xs))
        ok = bool((out[:, :, :43] == ref_out[:, :, :43]).all())
        t = device_time_ms(jfn, imgs, ys, xs, reps=reps)
        print(f"v2 chunk={kp_chunk:2d} slots={nslots:2d}: {t:7.3f} ms  "
              f"({b*n*48*128*4/t/1e6:4.0f} GB/s)  match43={ok}")


# ---------------------------------------------------------------------------
# v2 prototype: 4-phase shifted copies -> (48, 128) bands + one-hot MXU
# compaction (no roll, no predicated dispatch).
# ---------------------------------------------------------------------------

V2_ROWS = 48
V2_LANES = 128


def _v2_kernel(ys_ref, xs_ref, img_ref, out_ref, scratch, sems, *,
               h, w, n, hp, kp_chunk, nslots):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    k0 = ci * kp_chunk

    def offsets(j):
        k = jnp.minimum(k0 + j, n - 1)
        y = ys_ref[bi, k]
        x = xs_ref[bi, k]
        r0 = jnp.clip(y - RAW_RADIUS, 0, h - V2_ROWS)
        c0 = jnp.clip(x - RAW_RADIUS, 0, w - RAW_SIZE)
        pr = (r0 >> 2) & 1
        sr = ((r0 - 4 * pr) >> 3) << 3
        pc = (c0 >> 6) & 1
        sc = ((c0 - 64 * pc) >> 7) << 7
        return (pr, pl.multiple_of(sr, 8), r0 - 4 * pr - sr,
                pc, pl.multiple_of(sc, 128), c0 - 64 * pc - sc)

    def dma(j, slot):
        pr, sr, _, pc, sc, _ = offsets(j)
        return pltpu.make_async_copy(
            img_ref.at[bi, pr, pc, pl.ds(sr, V2_ROWS), pl.ds(sc, V2_LANES)],
            scratch.at[slot],
            sems.at[slot],
        )

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (V2_ROWS, V2_ROWS), 1)
    row_r = jax.lax.broadcasted_iota(jnp.int32, (V2_ROWS, V2_ROWS), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (V2_LANES, RAW_SIZE), 0)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (V2_LANES, RAW_SIZE), 1)

    for j in range(min(nslots, kp_chunk)):
        dma(j, j).start()
    for j in range(kp_chunk):
        slot = j % nslots
        dma(j, slot).wait()
        _, _, roff, _, _, coff = offsets(j)
        oh_r = (iota_r == row_r + roff).astype(jnp.float32)
        oh_c = (iota_c == col_c + coff).astype(jnp.float32)
        cols = jax.lax.dot_general(
            scratch[slot], oh_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, j] = jax.lax.dot_general(
            oh_r, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if j + nslots < kp_chunk:
            dma(j + nslots, slot).start()


@functools.lru_cache(maxsize=None)
def build_v2(b, h, w, n, kp_chunk=16, nslots=8):
    n_pad = -(-n // kp_chunk) * kp_chunk
    grid = (b, n_pad // kp_chunk)
    hp = max(-(-h // 8) * 8, V2_ROWS)
    wp = max(-(-w // 128) * 128, V2_LANES)
    kernel = functools.partial(_v2_kernel, h=h, w=w, n=n, hp=hp,
                               kp_chunk=kp_chunk, nslots=nslots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, kp_chunk, ROWS, RAW_SIZE),
            lambda bi, ci, ys, xs: (bi, ci, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, V2_ROWS, V2_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ROWS, RAW_SIZE),
                                       jnp.float32),
    )

    def run(imgs, ys, xs):
        imgs_p = jnp.pad(imgs.astype(jnp.float32),
                         ((0, 0), (0, hp + 4 - h), (0, wp + 64 - w)))
        copies = jnp.stack([
            jnp.stack([imgs_p[:, dr:dr + hp, dc:dc + wp]
                       for dc in (0, 64)], axis=1)
            for dr in (0, 4)], axis=1)          # (b, 2, 2, hp, wp)
        return call(ys, xs, copies)[:, :n]

    return run


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# v3: phase-shifted copies -> (48, 128) bands + lane roll + 4-way row
# dispatch (exact for all f32; no MXU).
# ---------------------------------------------------------------------------


def _v3_kernel(ys_ref, xs_ref, img_ref, out_ref, scratch, sems, *,
               h, w, n, kp_chunk, nslots):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    k0 = ci * kp_chunk

    def offsets(j):
        k = jnp.minimum(k0 + j, n - 1)
        y = ys_ref[bi, k]
        x = xs_ref[bi, k]
        r0 = jnp.clip(y - RAW_RADIUS, 0, h - V2_ROWS)
        c0 = jnp.clip(x - RAW_RADIUS, 0, w - RAW_SIZE)
        pr = (r0 >> 2) & 1
        sr = ((r0 - 4 * pr) >> 3) << 3
        pc = (c0 >> 6) & 1
        sc = ((c0 - 64 * pc) >> 7) << 7
        return (pr, pl.multiple_of(sr, 8), r0 - 4 * pr - sr,
                pc, pl.multiple_of(sc, 128), c0 - 64 * pc - sc)

    def dma(j, slot):
        pr, sr, _, pc, sc, _ = offsets(j)
        return pltpu.make_async_copy(
            img_ref.at[bi, pr, pc, pl.ds(sr, V2_ROWS), pl.ds(sc, V2_LANES)],
            scratch.at[slot, pl.ds(0, V2_ROWS)],
            sems.at[slot],
        )

    @pl.when((bi == 0) & (ci == 0))
    def _():
        for s in range(nslots):
            scratch[s, V2_ROWS:] = jnp.zeros((8, V2_LANES), jnp.float32)

    for j in range(min(nslots, kp_chunk)):
        dma(j, j).start()
    for j in range(kp_chunk):
        slot = j % nslots
        dma(j, slot).wait()
        _, _, roff, _, _, coff = offsets(j)
        band = pltpu.roll(scratch[slot], (V2_LANES - coff) % V2_LANES, 1)
        for rr in range(4):
            @pl.when(roff == rr)
            def _(rr=rr):
                out_ref[0, j] = band[rr:rr + ROWS, :RAW_SIZE]
        if j + nslots < kp_chunk:
            dma(j + nslots, slot).start()


@functools.lru_cache(maxsize=None)
def build_v3(b, h, w, n, kp_chunk=16, nslots=8):
    n_pad = -(-n // kp_chunk) * kp_chunk
    grid = (b, n_pad // kp_chunk)
    hp = max(-(-h // 8) * 8, V2_ROWS)
    wp = max(-(-w // 128) * 128, V2_LANES)
    kernel = functools.partial(_v3_kernel, h=h, w=w, n=n,
                               kp_chunk=kp_chunk, nslots=nslots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, kp_chunk, ROWS, RAW_SIZE),
            lambda bi, ci, ys, xs: (bi, ci, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, V2_ROWS + 8, V2_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ROWS, RAW_SIZE),
                                       jnp.float32),
    )

    def run(imgs, ys, xs):
        imgs_p = jnp.pad(imgs.astype(jnp.float32),
                         ((0, 0), (0, hp + 4 - h), (0, wp + 64 - w)))
        copies = jnp.stack([
            jnp.stack([imgs_p[:, dr:dr + hp, dc:dc + wp]
                       for dc in (0, 64)], axis=1)
            for dr in (0, 4)], axis=1)          # (b, 2, 2, hp, wp)
        return call(ys, xs, copies)[:, :n]

    return run
