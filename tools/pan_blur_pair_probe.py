"""Per-pair production-path errors on the blurred pan scene.

The per-hypothesis diag (score_variants_diag --nuisance blur) shows the
adaptive sigma collapsing winner errors, but the chained-trajectory RPE
in pan_harsh_ablation barely moves. This probe runs the REAL production
path (estimate_pair: matcher -> RANSAC -> refit -> recover_pose) per
consecutive pair on the exact ablation scene (pan seed 0, T=32, harsh
blur) and reports rotation + translation-direction errors vs ground
truth for adaptive / fixed-0.5 / fixed-1.0, so the stage that absorbs
the win is identified. Run on the TPU host.
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
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.pipeline.step import estimate_pair
    from tpu_vo.utils.synthetic import (
        apply_photometric_nuisances,
        make_pan_sequence,
    )

    W, H, T = 320, 240, 32
    frames, Rs, ts, _ = make_pan_sequence(n_frames=T, width=W, height=H,
                                          seed=0)
    frames = apply_photometric_nuisances(frames, seed=17, blur_len_px=5.0,
                                         which=("blur",))

    cfgs = {
        "adaptive": VOConfig(image_width=W, image_height=H,
                             orb=ORBConfig(n_features=1200)),
        "fixed0.5": VOConfig(image_width=W, image_height=H,
                             orb=ORBConfig(n_features=1200),
                             ransac=RansacConfig(adaptive_sigma=False)),
        "fixed1.0": VOConfig(
            image_width=W, image_height=H, orb=ORBConfig(n_features=1200),
            ransac=RansacConfig(adaptive_sigma=False,
                                score_sigma_scale=1.0)),
    }

    feats = None
    out = {}
    for name, cfg in cfgs.items():
        detect = jax.jit(lambda f, c=cfg: detect_and_compute(f, c.orb))
        if feats is None:     # same ORB config across variants
            feats = [detect(jnp.asarray(f)) for f in frames]
        est_fn = jax.jit(lambda a, b, k, c=cfg: estimate_pair(a, b, k, c))
        rot, terr = [], []
        for i in range(T - 1):
            e = est_fn(feats[i], feats[i + 1],
                       jax.random.fold_in(jax.random.PRNGKey(0), i + 1))
            R_gt = Rs[i + 1].T @ Rs[i]
            t_gt = Rs[i + 1].T @ (ts[i] - ts[i + 1])
            t_gt = t_gt / np.linalg.norm(t_gt)
            c = (np.trace(np.asarray(e["R"]).T @ R_gt) - 1) / 2
            rot.append(float(np.degrees(np.arccos(np.clip(c, -1, 1)))))
            tv = np.asarray(e["t"]).ravel()
            tv = tv / (np.linalg.norm(tv) + 1e-12)
            terr.append(float(np.degrees(np.arccos(
                np.clip(abs(np.dot(tv, t_gt)), -1, 1)))))
        r, te = np.asarray(rot), np.asarray(terr)
        out[name] = {
            "rot_mean": round(float(r.mean()), 3),
            "rot_p90": round(float(np.percentile(r, 90)), 3),
            "rot_max": round(float(r.max()), 3),
            "terr_mean": round(float(te.mean()), 2),
            "terr_p90": round(float(np.percentile(te, 90)), 2),
            "terr_max": round(float(te.max()), 2),
        }
        print(json.dumps({"variant": name, **out[name]}), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "pan_blur_pair_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
