"""Decompose the headline bench (run_sequence_batched, 1241x376, T=64)
into device-sustained per-stage times, to find where bench-measured
ms/frame exceeds the stage-table sum.

Usage: python tools/profile_headline.py  (on the TPU host)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from tools.device_time import device_time_ms
from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.pipeline.runner import (
    _chunked_map,
    chain_relative_poses,
    run_sequence_batched,
)
from tpu_vo.pipeline.step import estimate_pair
from tpu_vo.utils.synthetic import make_sequence


def main():
    W, H, T = 1241, 376, 64
    fc = int(os.environ.get("FC", "8"))
    pc = int(os.environ.get("PC", "9"))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200),
                   ransac=RansacConfig(max_iters=256))

    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    frames = jax.device_put(np.stack(frames_np))

    # stage 1: features
    def feats_fn(f):
        return _chunked_map(lambda x: detect_and_compute(x, cfg.orb), f, fc)

    feats = jax.jit(feats_fn)(frames)
    feats = jax.tree.map(lambda a: a.block_until_ready(), feats)

    prev = jax.tree.map(lambda a: a[:-1], feats)
    cur = jax.tree.map(lambda a: a[1:], feats)
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, T, dtype=jnp.int32))

    def pairs_fn(p, c, k):
        return _chunked_map(
            lambda args: estimate_pair(args[0], args[1], args[2], cfg),
            (p, c, k), pc)

    est = jax.jit(pairs_fn)(prev, cur, keys)
    est = jax.tree.map(lambda a: a.block_until_ready(), est)

    def chain_fn(R, t, h, ok):
        return chain_relative_poses(R, t, h, ok, cfg)

    def full_fn(f):
        return run_sequence_batched(f, cfg, frame_chunk=fc, pair_chunk=pc)

    reps = int(os.environ.get("REPS", "8"))
    t_feats = device_time_ms(feats_fn, frames, reps=reps)
    t_pairs = device_time_ms(pairs_fn, prev, cur, keys, reps=reps)
    t_chain = device_time_ms(chain_fn, est["R"], est["t"], est["have_rt"],
                             est["pose_ok"], reps=reps)
    t_full = device_time_ms(full_fn, frames, reps=reps)

    print(f"T={T} fc={fc} pc={pc}")
    print(f"features (T frames): {t_feats:8.2f} ms  ({t_feats/T:6.3f} ms/frame)")
    print(f"pairs   (T-1 pairs): {t_pairs:8.2f} ms  ({t_pairs/(T-1):6.3f} ms/pair)")
    print(f"chain              : {t_chain:8.2f} ms")
    print(f"sum                : {t_feats+t_pairs+t_chain:8.2f} ms")
    print(f"full runner        : {t_full:8.2f} ms  ({t_full/T:6.3f} ms/frame"
          f" = {1000*T/t_full:.1f} fps)")


if __name__ == "__main__":
    main()
