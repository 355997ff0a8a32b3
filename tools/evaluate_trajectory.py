"""Trajectory evaluation: ATE / RPE between two trajectory files.

Accepts TUM format (8 columns: timestamp + translation + quaternion) and
KITTI odometry format (12 columns: T_wc[:3,:4] row-major), auto-detected
per file — so estimates evaluate directly against KITTI poses/<NN>.txt.

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


from tpu_vo.utils.metrics import umeyama_alignment  # noqa: E402


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

    from tpu_vo.utils.metrics import load_trajectory_any

    est_R, est_t = load_trajectory_any(args.estimate)
    gt_R, gt_t = load_trajectory_any(args.groundtruth)
    result = evaluate(
        np.asarray(est_t, dtype=np.float64),
        np.asarray(gt_t, dtype=np.float64),
        None if est_R is None else np.asarray(est_R, dtype=np.float64),
        None if gt_R is None else np.asarray(gt_R, dtype=np.float64),
        args.align,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
