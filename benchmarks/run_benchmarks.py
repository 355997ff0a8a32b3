"""Benchmark harness for the five BASELINE.json configs.

  1. Short mono sequence (~100 frames, 640x480, 1k ORB kps) + accuracy
     parity vs the OpenCV reference pipeline (ATE)
  2. Full KITTI-style sequence (1241x376, 2k kps): ORB + 5pt RANSAC +
     pose chaining
  3. High-density frontend: 8k keypoints/frame at 4K res, ratio-test
     Hamming matching
  4. Batched 8-sequence throughput run (vmapped pipeline sharded across
     TPU cores; on one chip the batch runs vmapped on that chip)
  5. Sliding-window triangulation + LM pose refinement (mini BA)

Usage: python benchmarks/run_benchmarks.py [--configs 1,2,4] [--frames N]
Writes benchmarks/results.json and prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.numpy.ravel(leaf)[:1])


def run_config_1(frames_override=None):
    import jax
    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.cv_reference import (
        ReferenceVO,
        absolute_trajectory_error,
    )
    from tpu_vo.utils.synthetic import make_sequence

    T = frames_override or 96
    W, H = 640, 480
    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))

    ref = ReferenceVO(W, H)
    t0 = time.perf_counter()
    traj_ref = ref.run(frames_np)
    ref_fps = T / (time.perf_counter() - t0)

    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                                 pair_chunk=T - 1))
    fence(run(frames))
    t0 = time.perf_counter()
    out = run(frames)
    fence(out)
    fps = T / (time.perf_counter() - t0)

    traj = np.asarray(out[0].t)
    ate = absolute_trajectory_error(traj, traj_ref)
    extent = float(np.linalg.norm(traj_ref[-1])) or 1.0
    return {
        "config": "1_short_mono_640x480_1k",
        "frames_per_sec_chip": round(fps, 2),
        "vs_opencv_reference": round(fps / ref_fps, 2),
        "ate_vs_reference": round(ate, 4),
        "ate_rel_extent": round(ate / extent, 4),
    }


def run_config_2(frames_override=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.synthetic import make_sequence

    T = frames_override or 64
    W, H = 1241, 376
    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=2000))
    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                                 pair_chunk=9))
    fence(run(frames))
    t0 = time.perf_counter()
    out = run(frames)
    fence(out)
    fps = T / (time.perf_counter() - t0)
    return {
        "config": "2_kitti_1241x376_2k",
        "frames_per_sec_chip": round(fps, 2),
    }


def run_config_3(frames_override=None):
    import jax

    from tpu_vo.configs import MatchConfig, ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.synthetic import make_sequence

    T = frames_override or 8
    W, H = 3840, 2160
    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    cfg = VOConfig(
        image_width=W, image_height=H,
        orb=ORBConfig(n_features=8000),
        match=MatchConfig(use_ratio_test=True),
    )
    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=2,
                                                 pair_chunk=T - 1))
    fence(run(frames))
    t0 = time.perf_counter()
    out = run(frames)
    fence(out)
    fps = T / (time.perf_counter() - t0)
    return {
        "config": "3_highdensity_4k_8k_ratio",
        "frames_per_sec_chip": round(fps, 2),
    }


def run_config_4(frames_override=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.parallel.mesh import make_mesh
    from tpu_vo.parallel.sharding import run_batch_of_sequences
    from tpu_vo.utils.synthetic import make_sequence

    B = 8
    T = frames_override or 16
    W, H = 640, 480
    seqs = []
    for b in range(B):
        f, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=b)
        seqs.append(np.stack(f))
    frames = jax.device_put(np.stack(seqs))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1), ("data", "seq"))

    fence(run_batch_of_sequences(frames, cfg, mesh, frame_chunk=8,
                                 pair_chunk=T - 1))
    t0 = time.perf_counter()
    out = run_batch_of_sequences(frames, cfg, mesh, frame_chunk=8,
                                 pair_chunk=T - 1)
    fence(out)
    fps = B * T / (time.perf_counter() - t0)
    return {
        "config": "4_batched_8seq_sharded",
        "frames_per_sec_total": round(fps, 2),
        "frames_per_sec_chip": round(fps / n_dev, 2),
        "devices": n_dev,
    }


def run_config_5(frames_override=None):
    import functools

    import jax
    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.geometry.camera import (
        intrinsics_from_image_size,
        normalize_points,
    )
    from tpu_vo.models.refinement import refine_window
    from tpu_vo.pipeline.runner import chain_relative_poses, _chunked_map
    from tpu_vo.pipeline.step import estimate_pair
    from tpu_vo.utils.synthetic import make_sequence

    T = frames_override or 32
    W, H = 640, 480
    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))
    frames = jax.device_put(np.stack(frames_np))
    K = intrinsics_from_image_size(W, H)

    def pipeline(frames):
        feats = _chunked_map(
            lambda f: detect_and_compute(f, cfg.orb), frames, 8)
        prev = jax.tree.map(lambda a: a[:-1], feats)
        cur = jax.tree.map(lambda a: a[1:], feats)
        base = jax.random.PRNGKey(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(1, T, dtype=jnp.int32))
        est = _chunked_map(
            lambda args: estimate_pair(args[0], args[1], args[2], cfg),
            (prev, cur, keys), None)
        # sliding-window triangulation + LM polish over all pairs
        x1 = normalize_points(prev.xy, K)
        x2 = jnp.take_along_axis(
            normalize_points(cur.xy, K),
            est["match_train_idx"][..., None], axis=1)
        ref = refine_window(x1, x2, est["match_mask"], est["R"], est["t"],
                            iters=6)
        return chain_relative_poses(ref.R_rel, ref.t_rel, est["have_rt"],
                                    est["pose_ok"], cfg)

    run = jax.jit(pipeline)
    fence(run(frames))
    t0 = time.perf_counter()
    out = run(frames)
    fence(out)
    fps = T / (time.perf_counter() - t0)
    return {
        "config": "5_window_triangulation_lm",
        "frames_per_sec_chip": round(fps, 2),
    }


RUNNERS = {1: run_config_1, 2: run_config_2, 3: run_config_3,
           4: run_config_4, 5: run_config_5}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--frames", type=int, default=0)
    args = p.parse_args(argv)

    results = []
    for c in [int(x) for x in args.configs.split(",")]:
        try:
            r = RUNNERS[c](args.frames or None)
        except Exception as e:  # report failures, keep going
            r = {"config": str(c), "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                for r in json.load(f):
                    merged[r.get("config")] = r
        except Exception:
            pass
    for r in results:
        merged[r.get("config")] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
