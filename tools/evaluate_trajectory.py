"""Trajectory evaluation: ATE / RPE between two TUM-format files.

Usage: python tools/evaluate_trajectory.py EST.txt GT.txt [--align scale]

Computes RMS absolute trajectory error (optionally with Umeyama similarity
alignment — monocular trajectories have arbitrary scale) and mean relative
pose errors over consecutive frames. Prints one JSON line.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool):
    """Similarity transform minimizing ||dst - (s R src + t)||^2."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs ** 2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def evaluate(est_t, gt_t, est_R=None, gt_R=None, align="none"):
    n = min(len(est_t), len(gt_t))
    est_t, gt_t = est_t[:n], gt_t[:n]
    if align in ("rigid", "scale") and n >= 3:
        s, R, t = umeyama_alignment(est_t, gt_t, align == "scale")
        est_t = (s * (R @ est_t.T)).T + t
    ate = float(np.sqrt(np.mean(np.sum((est_t - gt_t) ** 2, axis=1))))
    out = {"ate_rmse": round(ate, 6), "frames": n, "align": align}
    if est_R is not None and gt_R is not None:
        rels = []
        for i in range(1, n):
            dR_est = est_R[i - 1].T @ est_R[i]
            dR_gt = gt_R[i - 1].T @ gt_R[i]
            dR = dR_est.T @ dR_gt
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            rels.append(ang)
        out["rpe_rot_mean_deg"] = round(float(np.mean(rels)), 6)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("estimate")
    p.add_argument("groundtruth")
    p.add_argument("--align", choices=["none", "rigid", "scale"],
                   default="scale")
    args = p.parse_args(argv)

    from tpu_vo.io.trajectory_io import load_trajectory_tum

    _, est = load_trajectory_tum(args.estimate)
    _, gt = load_trajectory_tum(args.groundtruth)
    result = evaluate(
        np.asarray(est.t, dtype=np.float64),
        np.asarray(gt.t, dtype=np.float64),
        np.asarray(est.R, dtype=np.float64),
        np.asarray(gt.R, dtype=np.float64),
        args.align,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
