"""Honest device-side breakdown of the production selection stage.

VERDICT r2 weak #2 / ROADMAP open item 2: before polishing the fused
selection kernel for the >550 fps margin, measure where the ~0.8 ms
actually goes at the benchmark shapes (1241x376 pyramid, 8 levels):

  band     the overlapping haloed band-stack copy feeding the kernel
  kernel   the fused Pallas pass itself (FAST+NMS+Harris+pack+2x1 pool)
  pool+topk  XLA 1x2 pool + flatten + lax.top_k over the quarter map
  gather+rank  Harris gather at survivors + keep-ties mask + second top_k

Each row is device_time_ms (single-dispatch fori_loop, tunnel-immune).
Writes benchmarks/select_breakdown.json. Run on the TPU.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from tools.device_time import device_time_ms as _dt
    import functools
    # the axon tunnel round-trip (~35 ms) floors wall-time at
    # reps=32; amortize it to <0.2 ms per measurement
    device_time_ms = functools.partial(_dt, reps=1024, iters=3)
    from tpu_vo.configs import ORBConfig
    from tpu_vo.features.orb import features_per_level
    from tpu_vo.image.pyramid import build_pyramid
    from tpu_vo.ops import select_pallas as sp

    cfg = ORBConfig(n_features=2000)
    W, H = 1241, 376
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    levels = [jnp.asarray(l) for l in
              build_pyramid(img, cfg.n_levels, cfg.scale_factor)]
    budgets = features_per_level(cfg.n_features, cfg.n_levels,
                                 cfg.scale_factor)

    rows = []
    tot = {"band": 0.0, "kernel": 0.0, "pool_topk": 0.0, "gather_rank": 0.0,
           "whole": 0.0}
    for lvl, n_level in zip(levels, budgets):
        h, w = lvl.shape
        idx_bits = max(1, (h * w - 1).bit_length())
        w_pad = -(-w // 128) * 128
        rt = sp._row_tile(w_pad)
        h_even = h + (h % 2)
        h_pad = -(-h_even // rt) * rt
        n_bands = h_pad // rt

        def band_stack(im, rt=rt, h_pad=h_pad, w_pad=w_pad, h=h, w=w,
                       n_bands=n_bands):
            imgs_p = jnp.pad(im[None].astype(jnp.float32),
                             ((0, 0), (sp.HALO, h_pad - h + sp.HALO),
                              (0, w_pad - w)))
            return jnp.stack(
                [jax.lax.slice_in_dim(imgs_p, r * rt,
                                      r * rt + rt + 2 * sp.HALO, axis=1)
                 for r in range(n_bands)], axis=1)

        def kernel_only(im):
            return sp.fused_select_maps(im, cfg.fast_threshold,
                                        cfg.edge_threshold)

        k2 = min(2 * n_level, h * w)
        packed_ex, harris_ex, _ = jax.jit(kernel_only)(lvl)

        def pool_topk(packed, idx_bits=idx_bits, k2=k2, w=w):
            hp2, wp = packed.shape
            pooled = packed.reshape(hp2, wp // 2, 2).max(-1).reshape(-1)
            k_red = min(k2, pooled.shape[0])
            v, _ = jax.lax.top_k(pooled, k_red)
            return v

        def gather_rank(packed, harris_map, idx_bits=idx_bits, k2=k2,
                        w=w, n_level=n_level):
            hp2, wp = packed.shape
            pooled = packed.reshape(hp2, wp // 2, 2).max(-1).reshape(-1)
            k_red = min(k2, pooled.shape[0])
            v, _ = jax.lax.top_k(pooled, k_red)
            mask = jnp.int32((1 << idx_bits) - 1)
            idx2 = jnp.where(v > 0,
                             sp._bit_reverse(mask - (v & mask), idx_bits), 0)
            ys2, xs2 = idx2 // w, idx2 % w
            resp = jnp.where(v > 0, harris_map[ys2, xs2], -jnp.inf)
            k1 = min(n_level, k_red)
            v1, sel = jax.lax.top_k(resp, k1)
            return v1, ys2[sel], xs2[sel]

        t_band = device_time_ms(band_stack, lvl)
        t_kernel = device_time_ms(kernel_only, lvl)
        t_pool = device_time_ms(pool_topk, packed_ex)
        t_whole_gather = device_time_ms(gather_rank, packed_ex, harris_ex)
        t_gather = t_whole_gather - t_pool

        def whole(im):
            p, hm, _ = sp.fused_select_maps(im, cfg.fast_threshold,
                                            cfg.edge_threshold)
            return gather_rank(p, hm)

        t_whole = device_time_ms(whole, lvl)
        rows.append({
            "shape": [h, w], "n_level": n_level, "rt": rt,
            "band_ms": round(t_band, 4),
            "kernel_incl_band_ms": round(t_kernel, 4),
            "pool_topk_ms": round(t_pool, 4),
            "gather_rank_ms": round(t_gather, 4),
            "whole_ms": round(t_whole, 4),
        })
        tot["band"] += t_band
        tot["kernel"] += t_kernel
        tot["pool_topk"] += t_pool
        tot["gather_rank"] += t_gather
        tot["whole"] += t_whole
        print(rows[-1], flush=True)

    out = {"config": "1241x376 / 2000 kps / 8 levels",
           "levels": rows,
           "totals_ms": {k: round(v, 4) for k, v in tot.items()}}
    with open(os.path.join(root, "benchmarks", "select_breakdown.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["totals_ms"], indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
