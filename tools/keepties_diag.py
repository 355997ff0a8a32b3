"""Keep-ties root-cause diagnostic (VERDICT r2 next #3).

Question: why does the cv2-faithful keep-ties stage-1 cut
(configs.retain_best_keep_ties) HALVE ATE at 640x480 but degrade it 16x
at 1241x376?

Hypothesis under test: keep-ties=True reproduces cv::ORB faithfully —
including OpenCV's own accuracy penalty on the 1241x376 corridor (the
reference itself measures 2.47% vs GT there, benchmarks/results.json) —
because the FAST-score tie plateau at that resolution admits many
texture-aliasing corners whose Harris response edges out stabler,
higher-FAST-score corners. keep-ties=False is then not a parity bug but
an accuracy improvement over OpenCV.

Measurements, per resolution (640x480/1k and 1241x376/2k):
  A. keypoint-set overlap vs cv2.ORB_create for keep_ties in {False,True}
     (if True's overlap is higher, True IS the faithful mode);
  B. stage-1 tie-plateau size per level (candidates with FAST score >=
     the 2n-th value) vs the 2n exact cut and the 4n capacity;
  C. full-sequence ATE vs ground truth for both modes, plus the cv2
     reference pipeline's own ATE;
  D. match stability of the keypoints that keep-ties ADDS vs the ones it
     DISPLACES (mutual-NN match rate to the next frame).

Writes benchmarks/keepties_diag.json. Run on the TPU (the Pallas
selection path is the production tie-order).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kp_sets_cv2(img, n, levels=8):
    import cv2

    orb = cv2.ORB_create(n, 1.2, levels, 31, 0, 2, cv2.ORB_HARRIS_SCORE,
                         31, 10)
    kps = orb.detect(img, None)
    return {(int(round(k.pt[0] * 4)), int(round(k.pt[1] * 4)), k.octave)
            for k in kps}


def kp_sets_ours(img, cfg):
    import jax.numpy as jnp

    from tpu_vo.features.orb import detect_and_compute

    f = detect_and_compute(jnp.asarray(img), cfg)
    valid = np.asarray(f.valid)
    xy = np.asarray(f.xy)
    oct_ = np.asarray(f.octave)
    return {(int(round(xy[j, 0] * 4)), int(round(xy[j, 1] * 4)), int(oct_[j]))
            for j in np.nonzero(valid)[0]}, f


def plateau_stats(img, cfg):
    """Per-level: (#corners, plateau size at the 2n-th score, 2n, 4n)."""
    import jax.numpy as jnp

    from tpu_vo.features import fast
    from tpu_vo.features.orb import _border_mask, features_per_level
    from tpu_vo.image.pyramid import build_pyramid

    levels = build_pyramid(jnp.asarray(img, jnp.float32), cfg.n_levels,
                           cfg.scale_factor)
    budgets = features_per_level(cfg.n_features, cfg.n_levels,
                                 cfg.scale_factor)
    out = []
    for lvl, n_level in zip(levels, budgets):
        if n_level <= 0:
            continue
        h, w = lvl.shape
        score, keep = fast.detect(lvl, cfg.fast_threshold)
        keep = keep & _border_mask(h, w, cfg.edge_threshold)
        s = np.asarray(jnp.where(keep, score, 0.0)).ravel()
        s_sorted = np.sort(s)[::-1]
        n2 = min(2 * n_level, s.size)
        cut = s_sorted[n2 - 1]
        n_corners = int((s > 0).sum())
        plateau = int((s >= cut).sum()) if cut > 0 else n_corners
        out.append({"n_level": int(n_level), "corners": n_corners,
                    "cut_score": float(cut), "kept_keepties": plateau,
                    "cap_2n": n2, "cap_4n": min(4 * n_level, s.size)})
    return out


def match_rate(f0, f1, subset_idx):
    """Fraction of f0[subset_idx] keypoints with a mutual-NN match in f1."""
    import jax.numpy as jnp

    from tpu_vo.matching.hamming import mutual_nearest_match

    m = mutual_nearest_match(f0.desc32, f1.desc32, f0.valid, f1.valid)
    ok = np.asarray(m.valid)
    if len(subset_idx) == 0:
        return float("nan")
    return float(ok[subset_idx].mean())


def run_resolution(W, H, n_feat, T=32, frame_chunk=8, pair_chunk=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.cv_reference import ReferenceVO
    from tpu_vo.utils.metrics import trajectory_report
    from tpu_vo.utils.synthetic import make_corridor_sequence

    frames_np, Rs, ts, K = make_corridor_sequence(
        n_frames=T, width=W, height=H, seed=0)
    img = frames_np[0]
    res = {"resolution": f"{W}x{H}", "n_features": n_feat}

    # A: overlap vs cv2 for both modes
    cv_set = kp_sets_cv2(img, n_feat)
    feats = {}
    for kt in (False, True):
        cfg_o = ORBConfig(n_features=n_feat, retain_best_keep_ties=kt)
        ours, f = kp_sets_ours(img, cfg_o)
        feats[kt] = f
        res[f"overlap_vs_cv2_keepties_{kt}"] = round(
            len(ours & cv_set) / max(len(cv_set), 1), 4)

    # B: plateau sizes (tie-independent, base config)
    res["plateau_per_level"] = plateau_stats(img, ORBConfig(n_features=n_feat))

    # D: stability of added vs displaced keypoints (frame 0 -> frame 1)
    f0f, f0t = feats[False], feats[True]
    xyF = {tuple(v) for v in np.asarray(f0f.xy)[np.asarray(f0f.valid)].round(2).tolist()}
    xyT = {tuple(v) for v in np.asarray(f0t.xy)[np.asarray(f0t.valid)].round(2).tolist()}
    for kt, fset, other in ((False, f0f, xyT), (True, f0t, xyF)):
        cfg_o = ORBConfig(n_features=n_feat, retain_best_keep_ties=kt)
        _, f1 = kp_sets_ours(frames_np[1], cfg_o)
        xy = np.asarray(fset.xy).round(2)
        valid = np.asarray(fset.valid)
        uniq = [j for j in np.nonzero(valid)[0]
                if tuple(xy[j].tolist()) not in other]
        shared = [j for j in np.nonzero(valid)[0]
                  if tuple(xy[j].tolist()) in other]
        res[f"match_rate_unique_to_{kt}"] = round(
            match_rate(fset, f1, np.array(uniq, int)), 4)
        res[f"match_rate_shared_{kt}"] = round(
            match_rate(fset, f1, np.array(shared, int)), 4)
        res[f"n_unique_to_{kt}"] = len(uniq)

    # C: full-sequence ATE for both modes + cv2 reference
    frames = jax.device_put(np.stack(frames_np))
    for kt in (False, True):
        cfg = VOConfig(image_width=W, image_height=H,
                       orb=ORBConfig(n_features=n_feat,
                                     retain_best_keep_ties=kt))
        run = jax.jit(lambda f, c=cfg: run_sequence_batched(
            f, c, frame_chunk=frame_chunk,
            pair_chunk=pair_chunk or T - 1))
        out = run(frames)
        rep = trajectory_report(np.asarray(out[0].t), None, np.stack(ts))
        res[f"ate_vs_gt_rel_keepties_{kt}"] = rep.get("ate_vs_gt_rel")
    traj_ref = ReferenceVO(W, H).run(frames_np)
    rep = trajectory_report(traj_ref, None, np.stack(ts))
    res["ref_ate_vs_gt_rel"] = rep.get("ate_vs_gt_rel")
    return res


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # benchmark-config shapes (reuse the persistent compile cache)
    out = [run_resolution(640, 480, 1000, T=96, pair_chunk=95),
           run_resolution(1241, 376, 2000, T=64, pair_chunk=9)]
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "keepties_diag.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
