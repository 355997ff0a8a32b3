"""Root-cause the pan+harsh RPE deficit (VERDICT r4 next #6).

results.json config 6, pan_320x240/harsh: tpu_vo RPE-trans-per-step
0.757 vs reference 0.525 (1.44x) — the one regime where tpu_vo degrades
WORSE than the reference. This tool decomposes the harsh level into its
four nuisances applied alone (noise / exposure / blur / jpeg at harsh
amplitudes) and runs both estimators on identical frames, so the gap is
attributed to a mechanism instead of a gloss. Optional --knob sweeps
candidate fixes on the worst nuisance (MSAC sigma scale, FAST
threshold) to separate "estimator tuning" from "frontend starvation".

Run on the TPU host: python tools/pan_harsh_ablation.py
Writes benchmarks/pan_harsh_ablation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HARSH = dict(read_noise_std=4.0, exposure_amp=0.40, blur_len_px=5.0,
             jpeg_quality=50)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--knobs", action="store_true",
                   help="sweep candidate fixes on the blur nuisance")
    args = p.parse_args(argv)

    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.cv_reference import ReferenceVO
    from tpu_vo.utils.metrics import ate_rmse, extent, rpe, scale_matched_gt
    from tpu_vo.utils.synthetic import (
        apply_photometric_nuisances,
        make_pan_sequence,
    )

    W, H, T = 320, 240, args.frames
    frames_np, Rs, ts, _ = make_pan_sequence(n_frames=T, width=W, height=H,
                                             seed=0)
    gt_R, gt_t = np.stack(Rs), scale_matched_gt(np.stack(ts))
    gext = extent(gt_t)

    def run_tpu(deg, cfg):
        pc = next(c for c in (9, 7, 11, 13, T - 1)
                  if (T - 1) % c == 0 or c == T - 1)
        run = jax.jit(lambda f: run_sequence_batched(
            f, cfg, frame_chunk=8, pair_chunk=pc))
        poses, diags = run(jax.device_put(np.stack(deg)))
        return (np.asarray(poses.t), np.asarray(poses.R),
                np.asarray(diags["num_matches"]),
                np.asarray(diags["num_inliers"]),
                np.asarray(diags["pose_ok"]))

    def report(tag, deg, cfg, with_ref=True):
        our_t, our_R, nm, ni, ok = run_tpu(deg, cfg)
        entry = {
            "tpu_vo_ate_vs_gt_rel": round(ate_rmse(our_t, gt_t) / gext, 4),
            "tpu_vo_matches_median": int(np.median(nm)),
            "tpu_vo_inliers_median": int(np.median(ni)),
            "tpu_vo_pose_ok_frac": round(float(np.mean(ok)), 3),
        }
        entry.update({("tpu_vo_" + k): v for k, v in
                      rpe(our_t, gt_t, our_R, gt_R).items()})
        if with_ref:
            ref = ReferenceVO(W, H)
            traj_ref = ref.run(deg)
            entry["ref_ate_vs_gt_rel"] = round(
                ate_rmse(traj_ref, gt_t) / gext, 4)
            entry.update({("ref_" + k): v for k, v in
                          rpe(traj_ref, gt_t, ref.rotations(),
                              gt_R).items()})
            entry["ref_matches_median"] = int(np.median(
                [m for m in ref.match_counts()] or [0])) \
                if hasattr(ref, "match_counts") else None
        print(json.dumps({"case": tag, **entry}), flush=True)
        return entry

    base_cfg = VOConfig(image_width=W, image_height=H,
                        orb=ORBConfig(n_features=1200))

    results = {}
    cases = [("clean", None)]
    for n in ("noise", "exposure", "blur", "jpeg"):
        cases.append((f"only_{n}", dict(HARSH, which=(n,))))
    cases.append(("harsh_all", dict(HARSH)))
    for tag, kwargs in cases:
        deg = (frames_np if kwargs is None else
               apply_photometric_nuisances(frames_np, seed=17, **kwargs))
        results[tag] = report(tag, deg, base_cfg)

    if args.knobs:
        deg = apply_photometric_nuisances(frames_np, seed=17,
                                          **dict(HARSH, which=("blur",)))
        knob_cfgs = {
            "blur_sigma1.5": VOConfig(
                image_width=W, image_height=H,
                orb=ORBConfig(n_features=1200),
                ransac=RansacConfig(score_sigma_scale=1.5)),
            "blur_sigma2.0": VOConfig(
                image_width=W, image_height=H,
                orb=ORBConfig(n_features=1200),
                ransac=RansacConfig(score_sigma_scale=2.0)),
            "blur_fast5": VOConfig(
                image_width=W, image_height=H,
                orb=ORBConfig(n_features=1200, fast_threshold=5)),
            "blur_fast5_sigma1.5": VOConfig(
                image_width=W, image_height=H,
                orb=ORBConfig(n_features=1200, fast_threshold=5),
                ransac=RansacConfig(score_sigma_scale=1.5)),
        }
        for tag, cfg in knob_cfgs.items():
            results[tag] = report(tag, deg, cfg, with_ref=False)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "pan_harsh_ablation.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
