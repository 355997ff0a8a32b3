"""Benchmark harness for the five BASELINE.json configs plus the
photometric-robustness config.

  1. Short mono sequence (~96 frames, 640x480, 1k ORB kps) + accuracy
     parity vs the OpenCV reference pipeline (ATE/RPE) and ground truth
  2. Full KITTI-style sequence (1241x376, 2k kps): ORB + 5pt RANSAC +
     pose chaining
  3. High-density frontend: 8k keypoints/frame at 4K res, ratio-test
     Hamming matching
  4. Batched 8-sequence throughput run (vmapped pipeline sharded across
     TPU cores; on one chip the batch runs vmapped on that chip)
  5. Sliding-window triangulation + LM pose refinement (mini BA)
  6. Photometric-nuisance robustness: corridor+pan degraded with sensor
     noise / exposure flicker / motion blur / JPEG at 4 severity levels,
     tpu_vo vs the OpenCV reference on identical degraded frames
  7. Dynamic-scene robustness: independently moving object at three
     match-coverage levels, occluder pillars, and a low-texture stretch;
     tpu_vo vs the OpenCV reference on identical frames, plus measured
     object match share and RANSAC on-object inlier fraction

All configs run on the well-conditioned corridor sequence
(utils/synthetic.make_corridor_sequence — strong parallax, exact ground
truth; see tools/diagnose_ate.py for why the weak-parallax plane scene
makes the 1%-ATE target physically unreachable for ANY estimator) and
report both throughput and accuracy.

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


_SEQ_CACHE: dict = {}


def sustained_and_wall_fps(run, frames, n_frames, reps):
    """(device-sustained fps, one-shot wall fps) for a jittable run.

    Round 3 found config 3's recorded 11.4 fps was a tunnel artifact:
    the one-shot `t0; out = run(f); fence(out)` wall time carried ~570 ms
    of remote-dispatch overhead on a 128 ms device program
    (tools/probe_4k_gap.py). The headline number is now measured like
    every kernel in this repo: R reps inside one dispatch via the
    fori_loop harness (tools/device_time), dividing out the tunnel. The
    one-shot wall fps is kept alongside so the dispatch overhead stays
    visible — on a local-PCIe host the two converge.
    """
    from tools.device_time import device_time_ms

    ms = device_time_ms(run, frames, reps=reps, iters=3)

    out = run(frames)
    fence(out)
    t0 = time.perf_counter()
    out = run(frames)
    fence(out)
    wall = n_frames / (time.perf_counter() - t0)
    return n_frames / ms * 1e3, wall, out


def ref_with_band(W, H, frames_np, k=5):
    """OpenCV reference trajectory plus its own RANSAC scatter band.

    The reference trajectory is the exact legacy call
    (visual_odometry.cpp:213-216; deterministic in OpenCV 5 — its USAC
    core uses a fixed internal RNG and ignores cv2.setRNGSeed, measured).
    The band re-runs the same pipeline k times with the SAME
    confidence/threshold but distinct UsacParams.randomGeneratorState
    values and reports the max Umeyama-aligned relative ATE of those runs
    against the reference trajectory: how far the reference estimator
    itself wanders when only its RANSAC sampling changes. tpu_vo-vs-
    reference divergence within this band is indistinguishable from the
    reference's own sampling noise (VERDICT r2 next #4).

    Returns (traj_ref, band, ref_fps, ref_R) — traj_ref/fps/rotations
    from the legacy run.
    """
    from tpu_vo.utils.cv_reference import ReferenceVO
    from tpu_vo.utils.metrics import ate_rmse_aligned, extent

    t0 = time.perf_counter()
    ref = ReferenceVO(W, H)
    traj_ref = ref.run(frames_np)
    fps = len(frames_np) / (time.perf_counter() - t0)

    trajs = [ReferenceVO(W, H, ransac_state=12345 + s).run(frames_np)
             for s in range(k)]
    ext = extent(traj_ref)
    band = max((ate_rmse_aligned(t, traj_ref) / ext for t in trajs),
               default=0.0)
    return traj_ref, round(float(band), 4), fps, ref.rotations()


def parity_verdict(res, band):
    """North-star check: within 1% of the reference OR inside the
    reference's own RANSAC scatter band."""
    rel = res.get("ate_vs_reference_aligned_rel")
    if rel is None:
        return res
    res["ref_self_ate_band"] = band
    res["parity_within_ref_band"] = bool(rel <= max(band, 0.01))
    return res


def corridor(T, W, H, seed=0):
    """Cached corridor sequence (rendering 4K frames is not free)."""
    key = (T, W, H, seed)
    if key not in _SEQ_CACHE:
        from tpu_vo.utils.synthetic import make_corridor_sequence

        _SEQ_CACHE[key] = make_corridor_sequence(
            n_frames=T, width=W, height=H, seed=seed)
    return _SEQ_CACHE[key]


def run_config_1(frames_override=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.metrics import trajectory_report

    T = frames_override or 96
    W, H = 640, 480
    frames_np, Rs, ts, K = corridor(T, W, H)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))

    traj_ref, band, ref_fps, ref_R = ref_with_band(W, H, frames_np)

    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                                 pair_chunk=T - 1))
    fps, wall_fps, out = sustained_and_wall_fps(run, frames, T, reps=4)

    traj = np.asarray(out[0].t)
    res = {
        "config": "1_short_mono_640x480_1k",
        "frames_per_sec_chip": round(fps, 2),
        "one_shot_wall_fps": round(wall_fps, 2),
        "vs_opencv_reference": round(fps / ref_fps, 2),
    }
    res.update(trajectory_report(traj, traj_ref, np.stack(ts),
                                 our_R=np.asarray(out[0].R), ref_R=ref_R,
                                 gt_R=np.stack(Rs)))
    return parity_verdict(res, band)


def run_config_2(frames_override=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.metrics import trajectory_report

    T = frames_override or 64
    W, H = 1241, 376
    frames_np, Rs, ts, K = corridor(T, W, H)
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=2000))
    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=8,
                                                 pair_chunk=9))
    fps, wall_fps, out = sustained_and_wall_fps(run, frames, T, reps=4)

    traj_ref, band, _, ref_R = ref_with_band(W, H, frames_np)
    res = {
        "config": "2_kitti_1241x376_2k",
        "frames_per_sec_chip": round(fps, 2),
        "one_shot_wall_fps": round(wall_fps, 2),
    }
    res.update(trajectory_report(np.asarray(out[0].t), traj_ref,
                                 np.stack(ts), our_R=np.asarray(out[0].R),
                                 ref_R=ref_R, gt_R=np.stack(Rs)))
    return parity_verdict(res, band)


def run_config_3(frames_override=None):
    import jax

    from tpu_vo.configs import MatchConfig, ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.metrics import trajectory_report

    T = frames_override or 8
    W, H = 3840, 2160
    frames_np, Rs, ts, K = corridor(T, W, H)
    cfg = VOConfig(
        image_width=W, image_height=H,
        orb=ORBConfig(n_features=8000),
        match=MatchConfig(use_ratio_test=True),
    )
    frames = jax.device_put(np.stack(frames_np))
    run = jax.jit(lambda f: run_sequence_batched(f, cfg, frame_chunk=2,
                                                 pair_chunk=T - 1))
    fps, wall_fps, out = sustained_and_wall_fps(run, frames, T, reps=8)

    # Reference anchor (VERDICT r3 next #6): the cv2 reference runs fine
    # at 4K (~0.2 s/frame measured), so config 3 gets the same
    # ate_vs_reference + self-band fields as the other configs. Caveat
    # kept alongside: at T=8 the trajectory is short, so the relative
    # numbers carry more variance than configs 1/2.
    traj_ref, band, ref_fps, ref_R = ref_with_band(W, H, frames_np)
    res = {
        "config": "3_highdensity_4k_8k_ratio",
        "frames_per_sec_chip": round(fps, 2),
        "one_shot_wall_fps": round(wall_fps, 2),
        "ref_seconds_per_frame": round(1.0 / ref_fps, 3),
        "short_sequence_caveat": f"T={T}: ATE over a short 4K clip",
    }
    res.update(trajectory_report(np.asarray(out[0].t), traj_ref,
                                 np.stack(ts), our_R=np.asarray(out[0].R),
                                 ref_R=ref_R, gt_R=np.stack(Rs)))
    return parity_verdict(res, band)


def run_config_4(frames_override=None):
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.parallel.mesh import make_mesh
    from tpu_vo.parallel.sharding import run_batch_of_sequences
    from tpu_vo.utils.metrics import trajectory_report

    B = 8
    T = frames_override or 64
    W, H = 640, 480
    seqs, gts, gt_Rs = [], [], []
    for b in range(B):
        f, Rs, ts, K = corridor(T, W, H, seed=b)
        seqs.append(np.stack(f))
        gts.append(np.stack(ts))
        gt_Rs.append(np.stack(Rs))
    frames = jax.device_put(np.stack(seqs))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1000))
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1), ("data", "seq"))

    # Tiling (measured, tools/profile_batch8_flat.py): the flattened
    # runner chunks per CALL, not per sequence — fc=8/pc=56 sustains
    # 1105 fps on one chip vs 650 for round 4's vmapped fc=8/pc=15
    # (which inflated to 64-frame/120-pair nested calls). Chunks must
    # divide the per-device totals, so fall back down the ladder when
    # the mesh splits the batch.
    per_dev_frames = (B // n_dev) * T
    per_dev_pairs = (B // n_dev) * (T - 1)
    fc = next(c for c in (8, 4, 2, 1) if per_dev_frames % c == 0)
    pc = next(c for c in (56, 9, 7, 3, 1) if per_dev_pairs % c == 0)
    run = jax.jit(lambda f: run_batch_of_sequences(
        f, cfg, mesh, frame_chunk=fc, pair_chunk=pc))
    fps, wall_fps, out = sustained_and_wall_fps(run, frames, B * T, reps=4)

    # Accuracy on sequence 0 of the batch vs the OpenCV reference.
    traj_ref, band, _, ref_R = ref_with_band(W, H, seqs[0])
    res = {
        "config": "4_batched_8seq_sharded",
        "frames_per_sec_total": round(fps, 2),
        "frames_per_sec_chip": round(fps / n_dev, 2),
        "one_shot_wall_fps": round(wall_fps, 2),
        "devices": n_dev,
    }
    res.update(trajectory_report(np.asarray(out[0].t[0]), traj_ref, gts[0],
                                 our_R=np.asarray(out[0].R[0]), ref_R=ref_R,
                                 gt_R=gt_Rs[0]))
    return parity_verdict(res, band)


def run_config_5(frames_override=None):
    import jax
    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.geometry.camera import (
        intrinsics_from_image_size,
        normalize_points,
    )
    from tpu_vo.models.refinement import refine_window
    from tpu_vo.pipeline.runner import _chunked_map, chain_relative_poses
    from tpu_vo.pipeline.step import estimate_pair
    from tpu_vo.utils.metrics import trajectory_report

    T = frames_override or 32
    W, H = 640, 480
    frames_np, Rs, ts, _ = corridor(T, W, H)
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
    fps, wall_fps, out = sustained_and_wall_fps(run, frames, T, reps=4)

    traj_ref, band, _, ref_R = ref_with_band(W, H, frames_np)
    res = {
        "config": "5_window_triangulation_lm",
        "frames_per_sec_chip": round(fps, 2),
        "one_shot_wall_fps": round(wall_fps, 2),
    }
    res.update(trajectory_report(np.asarray(out.t), traj_ref, np.stack(ts),
                                 our_R=np.asarray(out.R), ref_R=ref_R,
                                 gt_R=np.stack(Rs)))
    return parity_verdict(res, band)


NUISANCE_LEVELS = {
    # name -> apply_photometric_nuisances kwargs (None = clean frames)
    "clean": None,
    "mild": dict(read_noise_std=1.0, exposure_amp=0.10, blur_len_px=2.0,
                 jpeg_quality=85),
    "full": dict(read_noise_std=2.0, exposure_amp=0.25, blur_len_px=3.0,
                 jpeg_quality=70),
    "harsh": dict(read_noise_std=4.0, exposure_amp=0.40, blur_len_px=5.0,
                  jpeg_quality=50),
}


def run_config_6(frames_override=None):
    """Photometric-nuisance robustness (VERDICT r3 next #2): corridor +
    pan scenes degraded with sensor noise / exposure flicker / motion
    blur / JPEG at increasing severity; ATE/RPE for tpu_vo AND the OpenCV
    reference on the SAME degraded frames. The comparison (does tpu_vo
    degrade like the reference does?) matters more than the absolutes —
    both consume identical pixels. One compile per scene (shapes are
    level-invariant)."""
    import jax

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.utils.cv_reference import ReferenceVO
    from tpu_vo.utils.metrics import (
        ate_rmse,
        extent,
        rpe,
        scale_matched_gt,
    )
    from tpu_vo.utils.synthetic import (
        apply_photometric_nuisances,
        make_pan_sequence,
    )

    scenes = []
    T = frames_override or 48
    f, Rs, ts, _ = corridor(T, 640, 480)
    scenes.append(("corridor_640x480", f, Rs, ts, 640, 480, T))
    Tp = max(8, T * 2 // 3)
    key = ("pan", Tp)
    if key not in _SEQ_CACHE:
        _SEQ_CACHE[key] = make_pan_sequence(n_frames=Tp, width=320,
                                            height=240, seed=0)
    fp, Rp, tp, _ = _SEQ_CACHE[key]
    scenes.append(("pan_320x240", fp, Rp, tp, 320, 240, Tp))

    res = {"config": "6_photometric_nuisance", "levels": {}}
    for name, frames_np, Rs, ts, W, H, Tn in scenes:
        cfg = VOConfig(image_width=W, image_height=H,
                       orb=ORBConfig(n_features=1200))
        pc = next(c for c in (9, 7, 11, 13, Tn - 1)
                  if (Tn - 1) % c == 0 or c == Tn - 1)
        run = jax.jit(lambda f, _cfg=cfg, _pc=pc: run_sequence_batched(
            f, _cfg, frame_chunk=8, pair_chunk=_pc))
        gt_R, gt_t = np.stack(Rs), scale_matched_gt(np.stack(ts))
        gext = extent(gt_t)
        for level, kwargs in NUISANCE_LEVELS.items():
            deg = (frames_np if kwargs is None else
                   apply_photometric_nuisances(frames_np, seed=17, **kwargs))
            ref = ReferenceVO(W, H)
            traj_ref = ref.run(deg)
            ref_R = ref.rotations()
            poses, _ = run(jax.device_put(np.stack(deg)))
            our_t = np.asarray(poses.t)
            our_R = np.asarray(poses.R)
            entry = {
                "tpu_vo_ate_vs_gt_rel": round(
                    ate_rmse(our_t, gt_t) / gext, 4),
                "ref_ate_vs_gt_rel": round(
                    ate_rmse(traj_ref, gt_t) / gext, 4),
            }
            entry.update({("tpu_vo_" + k): v for k, v in
                          rpe(our_t, gt_t, our_R, gt_R).items()})
            entry.update({("ref_" + k): v for k, v in
                          rpe(traj_ref, gt_t, ref_R, gt_R).items()})
            res["levels"].setdefault(name, {})[level] = entry
            print(json.dumps({"scene": name, "level": level, **entry}),
                  flush=True)
    return res


def run_config_7(frames_override=None):
    """Dynamic-scene robustness (VERDICT r4 next #2): structured
    outliers instead of matching noise. Five scenes on identical frames
    for tpu_vo and the OpenCV reference:

      obj_light/mid/heavy: an independently moving textured object at
        increasing match share. light/mid sit below the consensus
        majority (RANSAC must exclude the object); heavy is sized to
        cross it — there EVERY sample-consensus estimator (the
        reference's cv2 RANSAC included) locks onto the object's rigid
        motion, and the interesting number is whether tpu_vo degrades
        like the reference does.
      occluders: static pillars churning the match set (epipolar-
        consistent — accuracy should hold).
      low_texture: a blank-wall stretch crossed on end-cap features.

    For the moving-object scenes the per-pair attribution is measured
    on-device: median object keypoint share and median fraction of
    RANSAC inliers on the object (the exclusion metric pinned by
    tests/test_dynamic_scenes.py::test_ransac_excludes_moving_object).
    """
    import jax
    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.pipeline.runner import run_sequence_batched
    from tpu_vo.pipeline.step import estimate_pair
    from tpu_vo.utils.cv_reference import ReferenceVO
    from tpu_vo.utils.metrics import (
        ate_rmse,
        extent,
        rpe,
        scale_matched_gt,
    )
    from tpu_vo.utils.synthetic import make_dynamic_corridor_sequence

    T = frames_override or 48
    W, H = 640, 480
    SCENES = {
        "obj_light": dict(obj_size=1.2),
        "obj_mid": dict(obj_size=2.0),
        "obj_heavy": dict(obj_size=3.2),
        "occluders": dict(n_occluders=4),
        "low_texture": dict(low_texture_span=(10.0, 22.0)),
    }
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200))
    pc = next(c for c in (9, 7, 11, 13, T - 1)
              if (T - 1) % c == 0 or c == T - 1)
    run = jax.jit(lambda f: run_sequence_batched(
        f, cfg, frame_chunk=8, pair_chunk=pc))
    detect = jax.jit(lambda f: detect_and_compute(f, cfg.orb))
    est_fn = jax.jit(lambda a, b, k: estimate_pair(a, b, k, cfg))

    res = {"config": "7_dynamic_scene_robustness", "scenes": {}}
    for name, kwargs in SCENES.items():
        frames_np, Rs, ts, _, masks = make_dynamic_corridor_sequence(
            n_frames=T, width=W, height=H, **kwargs)
        gt_R, gt_t = np.stack(Rs), scale_matched_gt(np.stack(ts))
        gext = extent(gt_t)

        ref = ReferenceVO(W, H)
        traj_ref = ref.run(frames_np)
        ref_R = ref.rotations()
        poses, _ = run(jax.device_put(np.stack(frames_np)))
        our_t, our_R = np.asarray(poses.t), np.asarray(poses.R)
        entry = {
            "tpu_vo_ate_vs_gt_rel": round(ate_rmse(our_t, gt_t) / gext, 4),
            "ref_ate_vs_gt_rel": round(ate_rmse(traj_ref, gt_t) / gext, 4),
        }
        entry.update({("tpu_vo_" + k): v for k, v in
                      rpe(our_t, gt_t, our_R, gt_R).items()})
        entry.update({("ref_" + k): v for k, v in
                      rpe(traj_ref, gt_t, ref_R, gt_R).items()})

        if name.startswith("obj"):
            shares, obj_fracs = [], []
            feats = [detect(jnp.asarray(f)) for f in frames_np]
            for i in range(T - 1):
                e = est_fn(feats[i], feats[i + 1],
                           jax.random.fold_in(jax.random.PRNGKey(0), i + 1))
                xy1 = np.asarray(feats[i].xy)
                xy2 = np.asarray(feats[i + 1].xy)[
                    np.asarray(e["match_train_idx"])]

                def on_obj(xy, m):
                    x = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
                    y = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
                    return m[y, x]

                obj = on_obj(xy1, masks[i]) | on_obj(xy2, masks[i + 1])
                valid = np.asarray(feats[i].valid)
                inl = np.asarray(e["match_mask"])
                shares.append((obj & valid).sum() / max(valid.sum(), 1))
                obj_fracs.append((inl & obj).sum() / max(inl.sum(), 1))
            entry["obj_kp_share_median"] = round(
                float(np.median(shares)), 3)
            entry["obj_inlier_frac_median"] = round(
                float(np.median(obj_fracs)), 3)
        res["scenes"][name] = entry
        print(json.dumps({"scene": name, **entry}), flush=True)
    return res


RUNNERS = {1: run_config_1, 2: run_config_2, 3: run_config_3,
           4: run_config_4, 5: run_config_5, 6: run_config_6,
           7: run_config_7}

# Canonical result names — error entries are keyed by these too, so a
# failed run of config N overwrites (and is overwritten by) N's success
# entry rather than living forever beside it.
CANONICAL = {
    1: "1_short_mono_640x480_1k",
    2: "2_kitti_1241x376_2k",
    3: "3_highdensity_4k_8k_ratio",
    4: "4_batched_8seq_sharded",
    5: "5_window_triangulation_lm",
    6: "6_photometric_nuisance",
    7: "7_dynamic_scene_robustness",
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="1,2,3,4,5,6,7")
    p.add_argument("--frames", type=int, default=0)
    args = p.parse_args(argv)

    results = []
    for c in [int(x) for x in args.configs.split(",")]:
        try:
            r = RUNNERS[c](args.frames or None)
            r["config"] = CANONICAL[c]
        except Exception as e:  # report failures, keep going
            r = {"config": CANONICAL[c], "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                for r in json.load(f):
                    name = r.get("config")
                    # retire legacy bare-numeric-id entries
                    if name in {str(k) for k in CANONICAL}:
                        continue
                    merged[name] = r
        except Exception:
            pass
    for r in results:
        merged[r.get("config")] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
