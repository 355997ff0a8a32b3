"""Keep-ties seed sweep: systematic effect vs RANSAC-draw noise.

Addendum to tools/keepties_diag.py. At 1241x376 the keep-ties modes
differ by only ~3% of the keypoint set yet ATE moves 0.2% -> 3.2%
(benchmarks/keepties_diag.json). This sweep runs both modes under K
distinct RANSAC seeds to decide whether keep-ties=True is SYSTEMATICALLY
worse (disjoint ATE bands) or whether the corridor at this resolution is
simply hypersensitive to keypoint-set perturbations (overlapping bands).

Writes benchmarks/keepties_seed_sweep.json. Run on the TPU.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [0, 1, 2, 3, 4]


def run_resolution(W, H, n_feat, T, frame_chunk=8, pair_chunk=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.metrics import trajectory_report
    from tpu_vo.utils.synthetic import make_corridor_sequence

    frames_np, Rs, ts, K = make_corridor_sequence(
        n_frames=T, width=W, height=H, seed=0)
    frames = jax.device_put(np.stack(frames_np))
    gt = np.stack(ts)

    res = {"resolution": f"{W}x{H}", "n_features": n_feat, "T": T,
           "seeds": SEEDS}
    for kt in (False, True):
        cfg = VOConfig(image_width=W, image_height=H,
                       orb=ORBConfig(n_features=n_feat,
                                     retain_best_keep_ties=kt))
        run = jax.jit(
            lambda f, s, c=cfg: run_sequence_batched(
                f, c, seed=s, frame_chunk=frame_chunk,
                pair_chunk=pair_chunk or T - 1),
            static_argnames=(),
        )
        ates = []
        for s in SEEDS:
            out = run(frames, s)
            rep = trajectory_report(np.asarray(out[0].t), None, gt)
            ates.append(round(float(rep["ate_vs_gt_rel"]), 5))
        res[f"ate_band_keepties_{kt}"] = {
            "per_seed": ates,
            "min": min(ates), "max": max(ates),
            "median": float(np.median(ates)),
        }
    return res


def main():
    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    out = [run_resolution(1241, 376, 2000, T=64, pair_chunk=9),
           run_resolution(640, 480, 1000, T=96, pair_chunk=95)]
    dst = os.path.join(root, "benchmarks", "keepties_seed_sweep.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
