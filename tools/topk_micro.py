"""Micro-benchmark: where does the selection pool+top_k time actually go,
and what would exact alternatives cost?

The fused selection kernel emits a (H/2, W_pad) int32 packed map; the XLA
side then does a 1x2 lane pool, a flatten, and lax.top_k(k2). Candidate
costs measured here at the bench level-0 shape (188 x 1280 pooled is the
end state; input map 188 x 1280):

  pool_flat    reshape(h, w/2, 2).max(-1).reshape(-1)   (relayout cost)
  flat_only    reshape(-1) of the already-pooled map     (linearize cost)
  topk_1d      lax.top_k over the flat map               (sort cost)
  topk_2d      lax.top_k over (rows, w) last axis then combine (2-stage)
  approx_f32   lax.approx_max_k on f32 scores            (ApproxTopK CC)
  sort_1d      jnp.sort full map (upper bound reference)

Run alone on the TPU (host contention corrupts the wall clocks):
  python tools/topk_micro.py
"""

from __future__ import annotations

import functools
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
    device_time_ms = functools.partial(_dt, reps=1024, iters=5)

    # bench config level-0 shapes: 1241x376 -> kernel packed (188, 1280)
    H2, WP = 188, 1280
    K2 = 706            # 2 * n_level(level 0, 1200 kps)
    rng = np.random.default_rng(0)
    # realistic sparsity: ~3% of pixels survive NMS+threshold
    dense = rng.integers(1, 2**28, (H2, WP), dtype=np.int32)
    mask = rng.random((H2, WP)) < 0.03
    packed = jnp.asarray(np.where(mask, dense, 0).astype(np.int32))
    pooled2d = jnp.asarray(
        np.maximum(packed.reshape(H2, WP // 2, 2)[:, :, 0],
                   packed.reshape(H2, WP // 2, 2)[:, :, 1]))

    rows = {}

    def pool_flat(p):
        return p.reshape(H2, WP // 2, 2).max(-1).reshape(-1)

    def flat_only(p2):
        return p2.reshape(-1)

    def topk_1d(p2):
        v, _ = jax.lax.top_k(p2.reshape(-1), K2)
        return v

    def topk_2d(p2):
        # exact 2-stage: per-row top-min(K2, w), then top-K2 of the union
        k_row = min(K2, p2.shape[1])
        vr, _ = jax.lax.top_k(p2, k_row)
        v, _ = jax.lax.top_k(vr.reshape(-1), K2)
        return v

    def topk_rowband(p2):
        # exact 2-stage over row bands: (G, rows/G * w) -> top-K2 each,
        # then top-K2 of the G*K2 union
        G = 4
        hpad = -(-p2.shape[0] // G) * G
        q = jnp.pad(p2, ((0, hpad - p2.shape[0]), (0, 0)))
        q = q.reshape(G, -1)
        vr, _ = jax.lax.top_k(q, K2)
        v, _ = jax.lax.top_k(vr.reshape(-1), K2)
        return v

    def approx_f32(p2):
        v, i = jax.lax.approx_max_k(p2.reshape(-1).astype(jnp.float32), K2)
        return v, i

    def sort_1d(p2):
        return jnp.sort(p2.reshape(-1))

    rows["pool_flat_ms"] = device_time_ms(pool_flat, packed)
    rows["flat_only_ms"] = device_time_ms(flat_only, pooled2d)
    rows["topk_1d_ms"] = device_time_ms(topk_1d, pooled2d)
    rows["topk_2d_ms"] = device_time_ms(topk_2d, pooled2d)
    rows["topk_rowband_ms"] = device_time_ms(topk_rowband, pooled2d)
    try:
        rows["approx_f32_ms"] = device_time_ms(approx_f32, pooled2d)
    except Exception as e:  # pragma: no cover
        rows["approx_f32_ms"] = f"error: {e}"
    rows["sort_1d_ms"] = device_time_ms(sort_1d, pooled2d)

    # exactness probes (values only; ties are unique ints here)
    t1 = np.asarray(topk_1d(pooled2d))
    t2 = np.asarray(topk_2d(pooled2d))
    tb = np.asarray(topk_rowband(pooled2d))
    rows["topk_2d_exact"] = bool((t1 == t2).all())
    rows["topk_rowband_exact"] = bool((t1 == tb).all())

    out = {"shape": [H2, WP], "k": K2, **{
        k: (round(v, 5) if isinstance(v, float) else v)
        for k, v in rows.items()}}
    print(json.dumps(out, indent=2))
    with open(os.path.join(root, "benchmarks", "topk_micro.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
