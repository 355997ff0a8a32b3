"""Tiling sweep for the FLATTENED DP batch runner (round 5).

After the _batch_runner flattening fix, frame_chunk/pair_chunk are the
true per-call batch sizes regardless of B. This sweep finds the
throughput-optimal tiling for config 4 (B=8 sequences, 640x480, 1k kps)
and locates the per-call pair-batch cliff the round-4 probe saw between
95 and 120 pairs. Run on the TPU host; writes
benchmarks/batch8_flat_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tools.device_time import device_time_ms
    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.parallel.mesh import make_mesh
    from tpu_vo.parallel.sharding import run_batch_of_sequences

    W, H = 640, 480
    B, T = 8, 64          # 512 frames, 504 pairs
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))
    rng = np.random.default_rng(0)
    mesh = make_mesh((len(jax.devices()), 1), ("data", "seq"))
    frames = jax.device_put(rng.integers(
        0, 255, size=(B, T, H, W), dtype=np.uint8))

    results = {}

    def probe(fc, pc, reps=2):
        name = f"flat_B8_T64_fc{fc}_pc{pc}"
        ms = device_time_ms(
            lambda f: run_batch_of_sequences(
                f, cfg, mesh, frame_chunk=fc, pair_chunk=pc),
            frames, reps=reps, iters=3)
        fps = B * T / ms * 1e3
        results[name] = {"ms": round(ms, 2), "fps": round(fps, 2)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    # pair-batch sweep at the production feature chunk
    for pc in (9, 56, 84, 126, 252):
        probe(8, pc)
    # feature-chunk sweep at the best-looking pair chunk
    for fc in (16, 32):
        probe(fc, 84)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "batch8_flat_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
