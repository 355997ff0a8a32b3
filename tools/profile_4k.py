"""Config-3 (4K / 8k kps) stage profile (VERDICT r2 next #8).

Times the pipeline's stages at 3840x2160 with 8000 keypoints and ratio
matching, next to the same stages at 1241x376/1200 (the tuned shape), and
prints measured-vs-scaling-model ratios so the 4K bound is explained, not
guessed. Appends nothing; results go to stdout as JSON (copy the table
into DESIGN.md).

Scaling model per stage:
  pyramid/FAST/Harris/selection-map: ~ pixels
  top-k: ~ pooled-pixels * log(k) (XLA TopK over the packed pooled map)
  patch extraction / descriptors:   ~ keypoints
  matching:                         ~ N^2 (bf16 MXU matmul)
  RANSAC scoring:                   ~ hypotheses x prescreen + finalists x N

Run on the TPU: python tools/profile_4k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from tpu_vo.configs import MatchConfig, ORBConfig, RansacConfig, VOConfig
from tpu_vo.features.orb import detect_and_compute, features_per_level
from tpu_vo.image.pyramid import build_pyramid
from tpu_vo.pipeline.step import estimate_pair
from tpu_vo.utils.profiling import fence


def timeit(fn, *args, batch=1, reps=64):
    """Per-frame ms via the single-dispatch fori_loop harness.

    Host-clock-per-dispatch timing is useless over the remote-TPU tunnel
    (~30 ms dispatch floor dwarfs every stage); tools/device_time runs
    `reps` iterations inside ONE dispatch so the floor amortizes away.
    """
    from tools.device_time import device_time_ms

    return device_time_ms(jax.jit(fn), *args, reps=reps, iters=3) / batch


def profile(W, H, n_feat, ratio, B, max_iters=256, reps=64):
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=n_feat),
                   match=MatchConfig(use_ratio_test=ratio),
                   ransac=RansacConfig(max_iters=max_iters))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, H, W), dtype=np.uint8))
    res = {"shape": f"{W}x{H}", "kps": n_feat, "batch": B}

    res["pyramid_ms"] = timeit(
        jax.vmap(lambda im: build_pyramid(
            im.astype(jnp.float32), cfg.orb.n_levels,
            cfg.orb.scale_factor)), imgs, batch=B, reps=reps)

    from tpu_vo.features import fast
    if fast._use_pallas():
        from tpu_vo.ops.select_pallas import fused_select_maps

        def sel_maps(im):
            ls = build_pyramid(im.astype(jnp.float32), cfg.orb.n_levels,
                               cfg.orb.scale_factor)
            return [fused_select_maps(l, cfg.orb.fast_threshold,
                                      cfg.orb.edge_threshold)[:2]
                    for l in ls]

        res["select_maps_ms"] = timeit(
            jax.vmap(sel_maps), imgs, batch=B, reps=reps)

        from tpu_vo.features.orb import _select_level_keypoints

        def sel_full(im):
            ls = build_pyramid(im.astype(jnp.float32), cfg.orb.n_levels,
                               cfg.orb.scale_factor)
            budgets = features_per_level(cfg.orb.n_features,
                                         cfg.orb.n_levels,
                                         cfg.orb.scale_factor)
            return [_select_level_keypoints(l, n, cfg.orb)[:2]
                    for l, n in zip(ls, budgets) if n > 0]

        res["select_plus_topk_ms"] = timeit(
            jax.vmap(sel_full), imgs, batch=B, reps=reps)

    res["frontend_ms"] = timeit(
        jax.vmap(lambda im: detect_and_compute(im, cfg.orb)),
        imgs, batch=B, reps=reps)

    feats = jax.jit(jax.vmap(
        lambda im: detect_and_compute(im, cfg.orb)))(imgs)
    prev = jax.tree.map(lambda a: a[:-1], feats)
    cur = jax.tree.map(lambda a: a[1:], feats)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
        jnp.arange(1, B, dtype=jnp.int32))
    res["pair_ms"] = timeit(
        jax.vmap(lambda p, c, k: estimate_pair(p, c, k, cfg)),
        prev, cur, keys, batch=B - 1, reps=reps)
    return res


def main():
    base = profile(1241, 376, 1200, False, 8, reps=128)
    hi = profile(3840, 2160, 8000, True, 2, reps=16)
    px = (3840 * 2160) / (1241 * 376)
    kp = 8000 / 1200
    model = {
        "pyramid_ms": px, "select_maps_ms": px,
        "select_plus_topk_ms": px,        # top-k adds ~log-factor only
        "frontend_ms": None, "pair_ms": None,
    }
    print(json.dumps({"base_1241x376": base, "hi_4k": hi}, indent=2))
    print("\nstage           1241x376   4K        x-measured  x-pixels(17.8)/kps(6.7)")
    for k in base:
        if not k.endswith("_ms") or k not in hi:
            continue
        r = hi[k] / max(base[k], 1e-9)
        exp = model.get(k)
        tag = f"{exp:.1f}" if exp else "-"
        print(f"{k:16s} {base[k]:8.3f}  {hi[k]:8.3f}  {r:8.1f}x   {tag}")


if __name__ == "__main__":
    main()
