"""Locate the config-3 gap: 8-frame 4K run times 88 ms/frame in the
benchmark while the profiled stage sum (tools/profile_4k.py) is ~15.4.

Times, with the single-dispatch harness (tunnel-immune):
  whole     the exact run_config_3 program (run_sequence_batched,
            frame_chunk=2, pair_chunk=7) per frame
  frontend  the chunked detect_and_compute stage alone per frame
  pairs     the chunked estimate_pair stage alone per pair (fed by
            precomputed features)
  chain     the associative-scan pose chaining

Random frames: static shapes drive every stage's cost (RANSAC budget is
fixed); content only changes which branches' masks fire. Run on the TPU.
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

    from tools.device_time import device_time_ms
    from tpu_vo.configs import MatchConfig, ORBConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.pipeline.runner import (
        _chunked_map,
        chain_relative_poses,
        run_sequence_batched,
    )
    from tpu_vo.pipeline.step import estimate_pair

    T, W, H = 8, 3840, 2160
    cfg = VOConfig(
        image_width=W, image_height=H,
        orb=ORBConfig(n_features=8000),
        match=MatchConfig(use_ratio_test=True),
    )
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (T, H, W), dtype=np.uint8))

    res = {}

    def frontend(f):
        return _chunked_map(lambda x: detect_and_compute(x, cfg.orb), f, 2)

    res["frontend_ms_per_frame"] = device_time_ms(
        frontend, frames, reps=8, iters=3) / T

    feats = jax.jit(frontend)(frames)
    prev = jax.tree.map(lambda a: a[:-1], feats)
    cur = jax.tree.map(lambda a: a[1:], feats)
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, T, dtype=jnp.int32))

    def pairs(p, c, k):
        return _chunked_map(
            lambda args: estimate_pair(args[0], args[1], args[2], cfg),
            (p, c, k), T - 1)

    res["pairs_ms_per_pair"] = device_time_ms(
        pairs, prev, cur, keys, reps=8, iters=3) / (T - 1)

    est = jax.jit(pairs)(prev, cur, keys)
    res["chain_ms"] = device_time_ms(
        lambda R, t, h, ok: chain_relative_poses(R, t, h, ok, cfg),
        est["R"], est["t"], est["have_rt"], est["pose_ok"],
        reps=32, iters=3)

    res["whole_ms_per_frame"] = device_time_ms(
        lambda f: run_sequence_batched(f, cfg, frame_chunk=2,
                                       pair_chunk=T - 1),
        frames, reps=8, iters=3) / T

    res["stagesum_ms_per_frame"] = round(
        res["frontend_ms_per_frame"]
        + res["pairs_ms_per_pair"] * (T - 1) / T
        + res["chain_ms"] / T, 3)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
