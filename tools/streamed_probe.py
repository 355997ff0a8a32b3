"""Probe: device time vs dispatch overhead of the streamed step.

The IO decomposition (benchmarks/io_decomposition.json) shows the
streamed runner at ~95 fps on pre-decoded host chunks while the batched
pipeline hits ~500 fps device-resident. Per (chunk, frame_chunk,
pair_chunk) combo this measures:

  - wall_one_ms: one step dispatch + scalar fetch (includes axon RTT),
  - wall_chain8_per_step_ms: 8 carry-chained dispatches, ONE fetch at
    the end. If dispatch is asynchronous the per-step cost here is the
    true device time; if it matches wall_one_ms, every dispatch blocks
    on the tunnel round trip.

No new compiles beyond what the runner itself uses (the step graphs are
in the persistent cache). Writes benchmarks/streamed_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
    from tpu_vo.pipeline.runner import _empty_features, _streamed_step_fn
    from tpu_vo.utils.synthetic import make_sequence

    W, H = 1241, 376
    frames_np, _, _, _ = make_sequence(n_frames=64, width=W, height=H, seed=0)
    arr = np.stack(frames_np)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200),
                   ransac=RansacConfig(max_iters=256))
    base = jax.random.PRNGKey(0)

    results = {}
    combos = [
        (16, None, None),
        (16, 8, 8),
        (64, None, None),
        (64, 8, 8),
    ]
    for chunk, fc, pc in combos:
        step = _streamed_step_fn(cfg, fc, pc)
        carry0 = _empty_features(cfg)
        payload = jax.device_put(arr[:chunk])
        off = jnp.asarray(0, jnp.int32)

        def one():
            t0 = time.perf_counter()
            _, est = step(carry0, payload, base, off)
            np.asarray(est["n_good"][-1])
            return (time.perf_counter() - t0) * 1e3

        def chain8():
            carry = carry0
            t0 = time.perf_counter()
            for _ in range(8):
                carry, est = step(carry, payload, base, off)
            np.asarray(est["n_good"][-1])
            return (time.perf_counter() - t0) / 8 * 1e3

        one()  # warmup/compile
        w1 = float(np.median([one() for _ in range(3)]))
        w8 = float(np.median([chain8() for _ in range(3)]))
        key = f"streamed_c{chunk}_fc{fc}_pc{pc}"
        results[key] = {
            "wall_one_ms": round(w1, 1),
            "wall_chain8_per_step_ms": round(w8, 1),
            "fps_one": round(chunk / w1 * 1e3, 1),
            "fps_chain8": round(chunk / w8 * 1e3, 1),
        }
        print(json.dumps({"combo": key, **results[key]}), flush=True)

    dst = os.path.join(root, "benchmarks", "streamed_probe.json")
    with open(dst, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
