"""Micro-benchmarks for frontend stage optimization candidates (round 2).

Times current vs candidate implementations of the hot ORB stages on the
real TPU (KITTI-style 1241x376, 8 levels, 1200 kps). Run:

    python tools/stage_bench.py [stage ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from tpu_vo.configs import ORBConfig
from tpu_vo.features import brief, fast, harris, orientation
from tpu_vo.features.orb import features_per_level, _border_mask
from tpu_vo.image.filters import gaussian_blur, gaussian_kernel_1d
from tpu_vo.image.pyramid import build_pyramid
from tpu_vo.utils.profiling import fence

H, W = 376, 1241
CFG = ORBConfig()


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters / B * 1e3  # ms per frame


B = 8  # frames per call — amortizes the remote-dispatch overhead
       # exactly like bench.py's batched pipeline does


def make_levels():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, size=(B, H, W), dtype=np.uint8))
    pyr = jax.jit(lambda im: build_pyramid(
        im.astype(jnp.float32), CFG.n_levels, CFG.scale_factor))(img)
    return [jax.block_until_ready(l) for l in pyr]


# ---------------------------------------------------------------- blur

def _reflect101_matrix(n: int, k: np.ndarray) -> np.ndarray:
    ks = len(k)
    pad = ks // 2
    M = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        for t in range(ks):
            j = i + t - pad
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            M[i, j] += k[t]
    return M


@functools.lru_cache(maxsize=None)
def _blur_mats(h: int, w: int, ksize: int, sigma: float):
    k = gaussian_kernel_1d(ksize, sigma)
    return (jnp.asarray(_reflect101_matrix(h, k)),
            jnp.asarray(_reflect101_matrix(w, k)))


def gaussian_blur_matmul(img, ksize=7, sigma=2.0, quantize=True):
    h, w = img.shape[-2], img.shape[-1]
    Bh, Bw = _blur_mats(h, w, ksize, sigma)
    x = img.astype(jnp.float32)
    x = jnp.einsum("ij,...jw->...iw", Bh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("...hj,wj->...hw", x, Bw,
                   precision=jax.lax.Precision.HIGHEST)
    if quantize:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x


def bench_blur(levels):
    cur = jax.jit(lambda ls: [gaussian_blur(l) for l in ls])
    mm = jax.jit(lambda ls: [gaussian_blur_matmul(l) for l in ls])  # batched: (B,h,w) per level
    t_cur = timeit(cur, levels)
    t_mm = timeit(mm, levels)
    # exactness vs current
    a = cur(levels)
    b = mm(levels)
    dmax = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    print(f"blur: shift-add {t_cur:.3f} ms  matmul {t_mm:.3f} ms  "
          f"max|diff| {dmax}")


# ---------------------------------------------------------- orientation

def select_keypoints(levels):
    """FAST+Harris selection per level (the part before orientation)."""
    budgets = features_per_level(CFG.n_features, CFG.n_levels,
                                 CFG.scale_factor)
    out = []
    for lvl, n_level in zip(levels, budgets):
        h, w = lvl.shape
        score, keep = fast.detect(lvl, CFG.fast_threshold)
        keep = keep & _border_mask(h, w, CFG.edge_threshold)
        masked = jnp.where(keep, score, 0.0)
        k2 = min(2 * n_level, h * w)
        v2, idx2 = jax.lax.top_k(masked.reshape(-1), k2)
        ys2, xs2 = idx2 // w, idx2 % w
        resp = harris.harris_at(lvl, ys2, xs2)
        resp = jnp.where(v2 > 0.0, resp, -jnp.inf)
        k1 = min(n_level, k2)
        v1, sel = jax.lax.top_k(resp, k1)
        out.append((ys2[sel], xs2[sel], jnp.isfinite(v1)))
    return out


def orientation_flat(levels, kps):
    """Candidate: one flat gather across levels for the prefix-sum ends."""
    from tpu_vo.features.orientation import (
        HALF_PATCH, build_umax, fast_atan2_deg,
    )
    umax = build_umax()
    v = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.int32)
    d = jnp.asarray(umax, dtype=jnp.int32)[jnp.abs(v)]

    flats = []
    bases = []
    base = 0
    idx_parts0, idx_parts1 = [], []
    xs_all = []
    for lvl, (ys, xs, valid) in zip(levels, kps):
        h, w = lvl.shape
        ii = jnp.round(lvl).astype(jnp.int32)
        x_idx = jnp.arange(w, dtype=jnp.int32)
        P0 = jnp.pad(jnp.cumsum(ii, axis=-1), ((0, 0), (1, 0)))
        P1 = jnp.pad(jnp.cumsum(ii * x_idx[None, :], axis=-1),
                     ((0, 0), (1, 0)))
        flats.append(jnp.stack([P0, P1]).ravel())  # (2*h*(w+1),)
        rows = jnp.clip(ys[:, None] + v[None, :], 0, h - 1)
        hi = jnp.clip(xs[:, None] + d[None, :] + 1, 0, w)
        lo = jnp.clip(xs[:, None] - d[None, :], 0, w)
        # flat indices into [P0;P1] of this level
        stride = h * (w + 1)
        r = rows * (w + 1)
        idx_parts0.append(jnp.concatenate(
            [base + r + hi, base + r + lo], axis=1))            # (N, 62)
        idx_parts1.append(jnp.concatenate(
            [base + stride + r + hi, base + stride + r + lo], axis=1))
        xs_all.append(xs)
        base += 2 * stride
    flat = jnp.concatenate(flats)
    i0 = jnp.concatenate(idx_parts0)   # (Ntot, 62)
    i1 = jnp.concatenate(idx_parts1)
    g = jnp.take(flat, jnp.concatenate([i0, i1], axis=1))  # (Ntot, 124)
    n31 = HALF_PATCH * 2 + 1
    s0 = g[:, :n31] - g[:, n31:2 * n31]
    s1 = g[:, 2 * n31:3 * n31] - g[:, 3 * n31:]
    xs_cat = jnp.concatenate(xs_all)
    m10 = jnp.sum(s1 - xs_cat[:, None] * s0, axis=1)
    m01 = jnp.sum(v[None, :] * s0, axis=1)
    return fast_atan2_deg(m01.astype(jnp.float32), m10.astype(jnp.float32))


def bench_orientation(levels):
    kp_fn = jax.jit(jax.vmap(select_keypoints))
    kps = jax.block_until_ready(kp_fn(levels))

    def cur(ls, ks):
        return jnp.concatenate([
            orientation.ic_angles_prefix(l, y, x)
            for l, (y, x, _) in zip(ls, ks)
        ])

    cur_j = jax.jit(jax.vmap(cur))
    flat_j = jax.jit(jax.vmap(orientation_flat))
    t_cur = timeit(cur_j, levels, kps)
    t_flat = timeit(flat_j, levels, kps)
    a = cur_j(levels, kps)
    b = flat_j(levels, kps)
    dmax = float(jnp.max(jnp.abs(a - b)))
    print(f"orientation: per-level {t_cur:.3f} ms  flat {t_flat:.3f} ms  "
          f"max|diff| {dmax}")


# ---------------------------------------------------------------- topk

def scores_per_level(levels):
    outs = []
    for lvl in levels:
        h, w = lvl.shape
        score, keep = fast.detect(lvl, CFG.fast_threshold)
        keep = keep & _border_mask(h, w, CFG.edge_threshold)
        outs.append(jnp.where(keep, score, 0.0))
    return outs


def topk_current(scores, budgets):
    outs = []
    for s, n in zip(scores, budgets):
        h, w = s.shape
        k2 = min(2 * n, h * w)
        v, i = jax.lax.top_k(s.reshape(-1), k2)
        outs.append((v, i))
    return outs


def topk_chunked(scores, budgets, n_chunks=16):
    """Exact hierarchical top-k: per-chunk top-k then top-k of candidates."""
    outs = []
    for s, n in zip(scores, budgets):
        h, w = s.shape
        k2 = min(2 * n, h * w)
        flat = s.reshape(-1)
        m = flat.shape[0]
        c = n_chunks
        pad = (-m) % c
        flat_p = jnp.pad(flat, (0, pad))
        chunks = flat_p.reshape(c, -1)
        kk = min(k2, chunks.shape[1])
        v_c, i_c = jax.lax.top_k(chunks, kk)            # (c, kk)
        gi = i_c + (jnp.arange(c) * chunks.shape[1])[:, None]
        v, j = jax.lax.top_k(v_c.reshape(-1), k2)
        outs.append((v, gi.reshape(-1)[j]))
    return outs


def topk_packed(scores, budgets):
    """Pack (score, idx) into int32 so top_k sorts 32-bit keys once.

    FAST scores are integers <= 254; index fits in 21 bits for <=2M px.
    Tie-break = lowest index first, same as lax.top_k on values.
    """
    outs = []
    for s, n in zip(scores, budgets):
        h, w = s.shape
        k2 = min(2 * n, h * w)
        flat = s.reshape(-1)
        m = flat.shape[0]
        idx = jnp.arange(m, dtype=jnp.int32)
        packed = (flat.astype(jnp.int32) << 21) | (m - 1 - idx)
        v, _ = jax.lax.top_k(packed, k2)
        outs.append(((v >> 21).astype(jnp.float32),
                     (m - 1) - (v & ((1 << 21) - 1))))
    return outs


def bench_topk(levels):
    budgets = features_per_level(CFG.n_features, CFG.n_levels,
                                 CFG.scale_factor)
    sc_fn = jax.jit(jax.vmap(scores_per_level))
    scores = jax.block_until_ready(sc_fn(levels))

    variants = {
        "current": jax.jit(jax.vmap(lambda s: topk_current(s, budgets))),
        "chunk8": jax.jit(jax.vmap(lambda s: topk_chunked(s, budgets, 8))),
        "chunk32": jax.jit(jax.vmap(lambda s: topk_chunked(s, budgets, 32))),
        "chunk128": jax.jit(jax.vmap(lambda s: topk_chunked(s, budgets, 128))),
        "packed": jax.jit(jax.vmap(lambda s: topk_packed(s, budgets))),
    }
    ref = None
    for name, fn in variants.items():
        t = timeit(fn, scores)
        out = fn(scores)
        vs = jnp.concatenate([v for v, _ in out], axis=-1)
        if ref is None:
            ref = vs
            ok = True
        else:
            ok = bool(jnp.all(vs == ref))
        print(f"topk[{name}]: {t:.3f} ms  values-match={ok}")


STAGES = {"blur": bench_blur, "orientation": bench_orientation,
          "topk": bench_topk}


def main():
    which = sys.argv[1:] or list(STAGES)
    levels = make_levels()
    print(f"platform={jax.devices()[0].platform} levels="
          f"{[tuple(l.shape) for l in levels]}")
    for name in which:
        STAGES[name](levels)




# ------------------------------------------------------------- ablation

def bench_ablate(levels):
    """Cumulative sub-pipelines of detect_and_compute on raw frames."""
    from tpu_vo.features import orb as orbmod
    from tpu_vo.features import brief as briefmod

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(B, H, W), dtype=np.uint8))
    budgets = features_per_level(CFG.n_features, CFG.n_levels,
                                 CFG.scale_factor)

    def pyramid_only(img):
        return build_pyramid(img.astype(jnp.float32), CFG.n_levels,
                             CFG.scale_factor)

    def thru_fast(img):
        ls = pyramid_only(img)
        return [fast.detect(l, CFG.fast_threshold)[0] for l in ls]

    def thru_topk(img):
        ls = pyramid_only(img)
        outs = []
        for lvl, n in zip(ls, budgets):
            h, w = lvl.shape
            score, keep = fast.detect(lvl, CFG.fast_threshold)
            keep = keep & _border_mask(h, w, CFG.edge_threshold)
            masked = jnp.where(keep, score, 0.0)
            k2 = min(2 * n, h * w)
            outs.append(jax.lax.top_k(masked.reshape(-1), k2))
        return outs

    def thru_harris(img):
        ls = pyramid_only(img)
        outs = []
        for lvl, n in zip(ls, budgets):
            h, w = lvl.shape
            score, keep = fast.detect(lvl, CFG.fast_threshold)
            keep = keep & _border_mask(h, w, CFG.edge_threshold)
            masked = jnp.where(keep, score, 0.0)
            k2 = min(2 * n, h * w)
            v2, idx2 = jax.lax.top_k(masked.reshape(-1), k2)
            ys2, xs2 = idx2 // w, idx2 % w
            resp = harris.harris_at(lvl, ys2, xs2)
            resp = jnp.where(v2 > 0.0, resp, -jnp.inf)
            k1 = min(n, k2)
            v1, sel = jax.lax.top_k(resp, k1)
            outs.append((ys2[sel], xs2[sel], jnp.isfinite(v1)))
        return outs

    def thru_orientation(img):
        ls = pyramid_only(img)
        kps = thru_harris.__wrapped__(img) if hasattr(thru_harris, "__wrapped__") else None
        # inline selection again (traced once, CSE'd with above is N/A here)
        outs = []
        sel_out = []
        for lvl, n in zip(ls, budgets):
            h, w = lvl.shape
            score, keep = fast.detect(lvl, CFG.fast_threshold)
            keep = keep & _border_mask(h, w, CFG.edge_threshold)
            masked = jnp.where(keep, score, 0.0)
            k2 = min(2 * n, h * w)
            v2, idx2 = jax.lax.top_k(masked.reshape(-1), k2)
            ys2, xs2 = idx2 // w, idx2 % w
            resp = harris.harris_at(lvl, ys2, xs2)
            resp = jnp.where(v2 > 0.0, resp, -jnp.inf)
            k1 = min(n, k2)
            v1, sel = jax.lax.top_k(resp, k1)
            ys, xs = ys2[sel], xs2[sel]
            sel_out.append((ys, xs))
            outs.append(orientation.ic_angles_prefix(lvl, ys, xs))
        return outs

    def full(img):
        return orbmod.detect_and_compute(img, CFG)

    stages = [
        ("pyramid", pyramid_only),
        ("+fast", thru_fast),
        ("+topk", thru_topk),
        ("+harris", thru_harris),
        ("+orientation", thru_orientation),
        ("full", full),
    ]
    prev = 0.0
    for name, f in stages:
        t = timeit(jax.jit(jax.vmap(f)), imgs)
        print(f"ablate[{name}]: {t:.3f} ms (delta {t - prev:+.3f})")
        prev = t


STAGES["ablate"] = bench_ablate


if __name__ == "__main__":
    main()
