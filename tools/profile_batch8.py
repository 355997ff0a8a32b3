"""Isolate the config-4 DP batching regression (VERDICT r4 next #1).

results.json r4: batched 8x640x480 sequences on ONE chip sustain 618.6
fps while a single 640x480 sequence sustains 1029.7 fps on identical
frames. Hypotheses, each probed as a tiling variant on the real chip:

  H1 per-call batch inflation: the DP runner vmaps run_sequence_batched
     over 8 sequences, so the inner _chunked_map tiles multiply by 8 —
     config 4's fc=8/pc=15 becomes an effective 64-frame feature call
     and a 120-pair RANSAC call, far past the tuned fc=8/pc=9 tiling
     (the streamed runner measured ~5x slowdowns when 16+ pairs run as
     one fused batch, pipeline/runner.py:182-189).
  H2 short-T amortization: T=16 gives 15 pairs against a fixed
     per-sequence chain + dummy-pair + first-frame overhead.
  H3 measurement: reps=2 vs 4 in the config harness.

Timing uses random frames — device time is content-independent (fixed
shapes, fixed iteration counts), so the host-side corridor render is
skipped. Run on the TPU host: python tools/profile_batch8.py
Writes benchmarks/batch8_probe.json.
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
    from tpu_vo.pipeline.runner import run_sequence_batched

    W, H = 640, 480
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))
    rng = np.random.default_rng(0)
    mesh = make_mesh((len(jax.devices()), 1), ("data", "seq"))

    def batch_frames(B, T):
        return jax.device_put(rng.integers(
            0, 255, size=(B, T, H, W), dtype=np.uint8))

    def seq_frames(T):
        return jax.device_put(rng.integers(
            0, 255, size=(T, H, W), dtype=np.uint8))

    results = {}

    def probe(name, fn, frames, n_frames, reps=4):
        ms = device_time_ms(fn, frames, reps=reps, iters=3)
        fps = n_frames / ms * 1e3
        results[name] = {"ms": round(ms, 2), "fps": round(fps, 2)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    # Reference point: config-1 exact tiling (single sequence).
    f96 = seq_frames(96)
    probe("single_T96_fc8_pc95",
          lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                         pair_chunk=95), f96, 96)
    # Single sequence, small pair chunk (pc=5 divides 95).
    probe("single_T96_fc8_pc5",
          lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                         pair_chunk=5), f96, 96)

    # Current config 4: vmap over 8 sequences, per-seq fc=8 pc=15.
    f816 = batch_frames(8, 16)
    probe("vmap8_T16_fc8_pc15",
          lambda f: run_batch_of_sequences(f, cfg, mesh, frame_chunk=8,
                                           pair_chunk=15), f816, 128)
    # H1: shrink per-seq chunks so the x8 vmap lands on the tuned
    # per-call batch (8 frames / 8 pairs per call).
    probe("vmap8_T16_fc1_pc1",
          lambda f: run_batch_of_sequences(f, cfg, mesh, frame_chunk=1,
                                           pair_chunk=1), f816, 128)
    probe("vmap8_T16_fc2_pc3",
          lambda f: run_batch_of_sequences(f, cfg, mesh, frame_chunk=2,
                                           pair_chunk=3), f816, 128)
    # H2: longer sequences, same vmap, tuned per-seq chunks.
    f864 = batch_frames(8, 64)
    probe("vmap8_T64_fc8_pc9",
          lambda f: run_batch_of_sequences(f, cfg, mesh, frame_chunk=8,
                                           pair_chunk=9), f864, 512, reps=2)
    probe("vmap8_T64_fc1_pc1",
          lambda f: run_batch_of_sequences(f, cfg, mesh, frame_chunk=1,
                                           pair_chunk=1), f864, 512, reps=2)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "batch8_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
