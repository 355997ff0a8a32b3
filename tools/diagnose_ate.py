"""Per-pair divergence diagnosis: tpu_vo vs ReferenceVO vs ground truth.

For every consecutive frame pair of the synthetic config-1 sequence,
measures rotation error (geodesic, deg) and translation-direction error
(deg) against ground truth for:
  A. the OpenCV reference pipeline (utils/cv_reference.ReferenceVO path)
  B. the tpu_vo pipeline (estimate_pair on our own features)
  C. cross: cv2.findEssentialMat+recoverPose on OUR matched points
  D. cross: our RANSAC+recover on the REFERENCE's matched points
C vs B isolates estimation; D vs A isolates the frontend.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cv2
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from tpu_vo.configs import VOConfig
from tpu_vo.estimation.ransac import (
    find_essential_ransac,
    pixel_threshold_to_normalized,
)
from tpu_vo.estimation.recover_pose import recover_pose_from_essential
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.geometry.camera import intrinsics_from_image_size, normalize_points
from tpu_vo.matching.filter import adaptive_threshold_filter
from tpu_vo.matching.hamming import mutual_nearest_match
from tpu_vo.utils import synthetic


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def dir_err_deg(ta, tb):
    ta = ta.ravel() / (np.linalg.norm(ta) + 1e-12)
    tb = tb.ravel() / (np.linalg.norm(tb) + 1e-12)
    c = abs(float(ta @ tb))  # sign-agnostic
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def cv_estimate(p1, p2, K):
    E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 2.0)
    if E is None or E.shape != (3, 3):
        return None
    ninl = int(mask.sum())
    nval, R, t, _ = cv2.recoverPose(E, p1, p2, K, mask=mask.copy())
    return R, t, ninl, nval


def our_estimate(p1, p2, K, cfg, key):
    n = cfg.orb.n_features
    pad = n - len(p1)
    if pad < 0:
        p1, p2 = p1[:n], p2[:n]
        pad = 0
    p1p = np.pad(p1, ((0, pad), (0, 0)))
    p2p = np.pad(p2, ((0, pad), (0, 0)))
    mask = np.arange(n) < len(p1)
    Kj = jnp.asarray(K, jnp.float32)
    x1n = normalize_points(jnp.asarray(p1p, jnp.float32), Kj)
    x2n = normalize_points(jnp.asarray(p2p, jnp.float32), Kj)
    thr = pixel_threshold_to_normalized(cfg.ransac.threshold_px, Kj)
    res = find_essential_ransac(
        x1n, x2n, jnp.asarray(mask), key, thr,
        max_iters=cfg.ransac.max_iters,
        use_five_point=cfg.ransac.use_five_point,
    )
    rec = recover_pose_from_essential(res.E, x1n, x2n, res.inliers,
                                      cfg.ransac.distance_thresh)
    return (np.asarray(rec.R), np.asarray(rec.t),
            int(res.num_inliers), int(rec.num_valid))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", choices=["planes", "corridor"],
                    default="planes")
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    w, h = 640, 480
    gen = (synthetic.make_corridor_sequence if args.scene == "corridor"
           else synthetic.make_sequence)
    frames, Rs, ts, K = gen(n_frames=args.frames, width=w, height=h)
    cfg = VOConfig(image_width=w, image_height=h)
    Kf = np.asarray(K, np.float64)

    orb = cv2.ORB_create(nfeatures=1200, scaleFactor=1.2, nlevels=8,
                         edgeThreshold=31, firstLevel=0, WTA_K=2,
                         scoreType=cv2.ORB_HARRIS_SCORE, patchSize=31,
                         fastThreshold=10)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)

    detect_j = jax.jit(functools.partial(detect_and_compute, cfg=cfg.orb))
    match_j = jax.jit(lambda a, b, va, vb: adaptive_threshold_filter(
        mutual_nearest_match(a, b, va, vb), cfg.match))

    rng = jax.random.PRNGKey(0)

    print(f"{'pair':>4} | {'A:ref rot/dir':>14} | {'B:ours rot/dir':>14} | "
          f"{'C:cvEst(our pts)':>16} | {'D:ourEst(ref pts)':>17} | inl A/B")
    sums = np.zeros((4, 2))
    cnt = 0
    for i in range(1, len(frames)):
        f1, f2 = frames[i - 1], frames[i]
        # GT relative motion camera2<-camera1
        R1, t1 = Rs[i - 1], ts[i - 1]
        R2, t2 = Rs[i], ts[i]
        R_rel = R2.T @ R1          # R_c2_c1
        t_rel = R2.T @ (t1 - t2)   # t_c2_c1

        # A: full reference path
        k1, d1 = orb.detectAndCompute(f1, None)
        k2, d2 = orb.detectAndCompute(f2, None)
        ms = bf.match(d1, d2)
        dists = sorted(m.distance for m in ms)
        thr = min(max(3.0 * dists[0], 0.7 * dists[len(dists) // 2]), 35.0)
        good = [m for m in ms if m.distance < thr]
        rp1 = np.float32([k1[m.queryIdx].pt for m in good])
        rp2 = np.float32([k2[m.trainIdx].pt for m in good])
        A = cv_estimate(rp1, rp2, Kf)

        # B: full tpu path
        feats1 = detect_j(jnp.asarray(f1))
        feats2 = detect_j(jnp.asarray(f2))
        gm, _ = match_j(feats1.desc32, feats2.desc32, feats1.valid,
                        feats2.valid)
        gm_valid = np.asarray(gm.valid)
        tidx = np.asarray(gm.train_idx)
        op1 = np.asarray(feats1.xy)[gm_valid]
        op2 = np.asarray(feats2.xy)[tidx[gm_valid]]
        key = jax.random.fold_in(rng, i)
        B = our_estimate(op1, op2, Kf, cfg, key)

        # C: cv estimation on our matched points
        C = cv_estimate(op1.astype(np.float32), op2.astype(np.float32), Kf)
        # D: our estimation on reference matched points
        D = our_estimate(rp1.astype(np.float64), rp2.astype(np.float64),
                         Kf, cfg, key)

        row = []
        for j, X in enumerate((A, B, C, D)):
            if X is None:
                row.append("   fail   ")
                continue
            R, t = X[0], X[1]
            re = rot_err_deg(R_rel, R)
            de = dir_err_deg(t_rel, t)
            sums[j] += (re, de)
            row.append(f"{re:5.2f}/{de:6.2f}")
        cnt += 1
        print(f"{i:>4} | {row[0]:>14} | {row[1]:>14} | {row[2]:>16} | "
              f"{row[3]:>17} | {A[2] if A else 0}/{B[2]}  "
              f"nmatch {len(good)}/{int(gm_valid.sum())}")

    print("\nmean rot/dir err (deg):")
    for name, s in zip(("A ref", "B ours", "C cv(our pts)",
                        "D ours(ref pts)"), sums):
        print(f"  {name:>16}: {s[0]/cnt:6.3f} / {s[1]/cnt:6.3f}")


if __name__ == "__main__":
    main()
