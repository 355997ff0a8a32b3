"""Faithful-vs-production parity matrix (VERDICT r3 next #1).

Runs the strict cv2-parity preset (`VOConfig.reference_parity()` —
keep-ties + exact stage-1 top-k + MSAC sigma 1.0 + no cheirality gate)
AND the production defaults across scenes x RANSAC seeds, against the
OpenCV reference pipeline and its own sampling-scatter band, so the
default-config decision is made JOINTLY — one table, every knob at once —
instead of per-knob.

Scenes: corridor at both benchmark resolutions (640x480, 1241x376) and
the rotation-rich pan sweep. For each (scene, variant): 5 tpu_vo seeds
through ONE compiled function; reports per-seed Umeyama-aligned relative
ATE vs the reference, ATE vs ground truth, and rotation RPE vs ground
truth. The reference's own band comes from 5 UsacParams-seeded reruns
(benchmarks/run_benchmarks.ref_with_band).

Usage: python tools/parity_matrix.py [--frames-scale 1.0] [--seeds 5]
Writes benchmarks/parity_matrix.json; run on the TPU (default backend).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SCENES = [
    # (name, maker, W, H, T, n_features)
    ("corridor_640x480", "corridor", 640, 480, 64, 1200),
    ("corridor_1241x376", "corridor", 1241, 376, 48, 1200),
    ("pan_320x240", "pan", 320, 240, 48, 1200),
    # compact CI leg (tests/test_reference_parity.py runs these shapes
    # on the CPU suite; full resolutions are TPU-gated there)
    ("corridor_320x240", "corridor", 320, 240, 48, 1200),
]


def make_scene(kind, T, W, H, seed=0):
    from tpu_vo.utils.synthetic import (
        make_corridor_sequence,
        make_pan_sequence,
    )

    fn = make_corridor_sequence if kind == "corridor" else make_pan_sequence
    return fn(n_frames=T, width=W, height=H, seed=seed)


def variant_cfg(variant, W, H, n_features):
    from tpu_vo.configs import ORBConfig, VOConfig

    if variant == "faithful":
        return VOConfig.reference_parity(image_width=W, image_height=H,
                                         n_features=n_features)
    return VOConfig(image_width=W, image_height=H,
                    orb=ORBConfig(n_features=n_features))


def run_variant(frames, cfg, seeds, pair_chunk):
    import jax
    import jax.numpy as jnp

    from tpu_vo.pipeline.runner import run_sequence_batched

    run = jax.jit(lambda f, s: run_sequence_batched(
        f, cfg, seed=s, frame_chunk=8, pair_chunk=pair_chunk))
    outs = []
    for s in range(seeds):
        poses, _ = run(frames, jnp.uint32(s))
        outs.append((np.asarray(poses.R), np.asarray(poses.t)))
    return outs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--frames-scale", type=float, default=1.0,
                   help="scale scene lengths (0.25 for a quick smoke)")
    p.add_argument("--scenes", default="",
                   help="comma-separated scene-name filter")
    args = p.parse_args(argv)

    import jax

    from benchmarks.run_benchmarks import ref_with_band
    from tpu_vo.utils.metrics import (
        ate_rmse,
        ate_rmse_aligned,
        extent,
        rpe,
        scale_matched_gt,
    )

    results = {"seeds": args.seeds, "scenes": {}}
    for name, kind, W, H, T, nf in SCENES:
        if args.scenes and name not in args.scenes.split(","):
            continue
        T = max(8, int(T * args.frames_scale))
        frames_np, Rs, ts, K = make_scene(kind, T, W, H)
        gt_R, gt_t = np.stack(Rs), scale_matched_gt(np.stack(ts))

        traj_ref, band, _, ref_R = ref_with_band(W, H, frames_np,
                                                 k=args.seeds)
        ext = extent(traj_ref)
        scene_res = {
            "frames": T, "resolution": f"{W}x{H}",
            "ref_self_ate_band": band,
            "ref_ate_vs_gt_rel": round(
                ate_rmse(traj_ref, gt_t) / extent(gt_t), 4),
        }

        frames = jax.device_put(np.stack(frames_np))
        # pair count T-1 is odd; chunk evenly
        pc = next(c for c in (9, 7, 11, 13, T - 1)
                  if (T - 1) % c == 0 or c == T - 1)
        for variant in ("faithful", "production"):
            cfg = variant_cfg(variant, W, H, nf)
            t0 = time.perf_counter()
            outs = run_variant(frames, cfg, args.seeds, pc)
            dt = time.perf_counter() - t0
            rels, gts, rpes = [], [], []
            for R_est, t_est in outs:
                rels.append(round(ate_rmse_aligned(t_est, traj_ref) / ext, 4))
                gts.append(round(
                    ate_rmse(t_est, gt_t) / extent(gt_t), 4))
                rpes.append(rpe(t_est, gt_t, R_est, gt_R).get(
                    "rpe_rot_mean_deg"))
            scene_res[variant] = {
                "ate_vs_ref_aligned_rel_per_seed": rels,
                "ate_vs_ref_max": max(rels),
                "within_band_all": bool(
                    max(rels) <= max(band, 0.01)),
                "ate_vs_gt_rel_per_seed": gts,
                "rpe_rot_mean_deg_per_seed": rpes,
                "wall_s": round(dt, 1),
            }
            print(json.dumps({"scene": name, "variant": variant,
                              **scene_res[variant]}), flush=True)
        results["scenes"][name] = scene_res

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "parity_matrix.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
