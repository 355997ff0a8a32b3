"""Per-pair scoring-variant diagnostic on the corridor at benchmark res.

The round-3 MSAC work fixed rotation-dominant pan pairs but regressed the
1241x376 corridor (keepties_seed_sweep.json bands moved 0.002 -> 0.07+).
This tool isolates the hypothesis-selection rule: for each consecutive
pair it draws ONE fixed hypothesis pool and ranks it under each variant,
reporting the winner's relative rotation/translation error vs ground
truth. Run on TPU (or CPU with JAX_PLATFORMS=cpu).

Variants:
  count       classic inlier counting at thr=2px
  msac1       MSAC raw sum, sigma = thr
  msac1n      MSAC per-inlier normalized, sigma = thr
  msac05n     MSAC per-inlier normalized, sigma = thr/2
  msac025n    MSAC per-inlier normalized, sigma = thr/4
  ladder      sum over sigma in {thr, thr/2, thr/4} of loss(sigma)/sigma^2
  laddern     ladder, per-inlier normalized
  lex         count, ties broken by tight (thr/4) loss
  adapt       two-phase data-adaptive sigma (round 5): rank by msac05n,
              estimate the localization-noise scale as the median Sampson
              residual of the winner's inliers, re-rank everything at
              score_sq = clip(9*median, (thr/2)^2, thr^2). Motivated by
              the pan+harsh ablation: a fixed sigma cannot win both the
              clean rotation-rich regime (thr/2 best) and heavy blur
              (thr best) — benchmarks/pan_harsh_ablation.json.

--nuisance blur applies the harsh motion blur (5 px) to the frames
before feature extraction, reproducing the regime where production
sigma 0.5 loses to the reference (VERDICT r4 next #6).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(W=1241, H=376, T=16, n_feat=2000, seeds=(0, 1), scene="corridor",
         nuisance="none"):
    import jax
    import jax.numpy as jnp

    from tpu_vo.configs import ORBConfig, VOConfig
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.matching.hamming import mutual_nearest_match
    from tpu_vo.matching.filter import adaptive_threshold_filter
    from tpu_vo.geometry.camera import (
        intrinsics_from_image_size, normalize_points)
    from tpu_vo.geometry.epipolar import sampson_error
    from tpu_vo.estimation.five_point import five_point_candidates
    from tpu_vo.estimation.ransac import (
        _draw_samples, pixel_threshold_to_normalized)
    from tpu_vo.estimation.recover_pose import recover_pose_from_essential
    from tpu_vo.utils.synthetic import (
        make_corridor_sequence, make_pan_sequence)

    gen = make_corridor_sequence if scene == "corridor" else make_pan_sequence
    frames, Rs, ts, _ = gen(n_frames=T, width=W, height=H,
                            seed=0 if scene == "corridor" else 3)
    if nuisance == "blur":
        from tpu_vo.utils.synthetic import apply_photometric_nuisances

        frames = apply_photometric_nuisances(
            frames, seed=17, blur_len_px=5.0, which=("blur",))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=n_feat))
    K = intrinsics_from_image_size(W, H)
    thr = float(pixel_threshold_to_normalized(2.0, K))
    thr_sq = thr ** 2
    half_sq = thr_sq * 0.25
    tight_sq = thr_sq * 0.0625

    feats = [detect_and_compute(jnp.asarray(f), cfg.orb) for f in frames]

    @jax.jit
    def pool_and_scores(x1n, x2n, mask, key):
        idx = _draw_samples(key, mask, 256, 5)
        Es, vm = jax.vmap(five_point_candidates)(x1n[idx], x2n[idx])
        Es = Es.reshape(-1, 3, 3)
        vm = vm.reshape(-1)

        def per_E(E):
            err = sampson_error(E, x1n, x2n)
            err = jnp.where(jnp.isfinite(err), err, jnp.inf)
            inl = (err < thr_sq) & mask
            cnt = jnp.sum(inl)
            broad = jnp.sum(jnp.where(mask, jnp.minimum(err, thr_sq), 0.0))
            half = jnp.sum(jnp.where(mask, jnp.minimum(err, half_sq), 0.0))
            tight = jnp.sum(jnp.where(mask, jnp.minimum(err, tight_sq), 0.0))
            return inl, cnt, broad, half, tight

        inls, cnts, broads, halfs, tights = jax.vmap(per_E)(Es)
        return Es, vm, inls, cnts, broads, halfs, tights

    variants = ["count", "msac1", "msac1n", "msac05n", "msac025n",
                "ladder", "laddern", "lex", "adapt"]
    out = {v: [] for v in variants}
    terr_out = {v: [] for v in variants}

    @jax.jit
    def med_inlier_err(E, x1n, x2n, inl):
        err = sampson_error(E, x1n, x2n)
        err = jnp.where(inl, err, jnp.nan)
        return jnp.nanmedian(err)

    @jax.jit
    def losses_at(Es_, x1n, x2n, mask, s_sq):
        def per_E(E):
            err = sampson_error(E, x1n, x2n)
            err = jnp.where(jnp.isfinite(err), err, jnp.inf)
            return jnp.sum(jnp.where(mask, jnp.minimum(err, s_sq), 0.0))
        return jax.vmap(per_E)(Es_)

    for i in range(T - 1):
        fa, fb = feats[i], feats[i + 1]
        raw = mutual_nearest_match(fa.desc32, fb.desc32, fa.valid, fb.valid)
        good, _ = adaptive_threshold_filter(raw, cfg.match)
        mask = good.valid
        x1n = normalize_points(fa.xy, K)
        x2n = normalize_points(fb.xy[good.train_idx], K)
        N = int(mask.shape[0])

        R_gt = Rs[i + 1].T @ Rs[i]
        t_gt = Rs[i + 1].T @ (ts[i] - ts[i + 1])
        t_gt = t_gt / np.linalg.norm(t_gt)

        for seed in seeds:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i + 1)
            with jax.default_matmul_precision("highest"):
                Es, vm, inls, cnts, broads, halfs, tights = pool_and_scores(
                    x1n, x2n, mask, key)
            cnts_f = np.asarray(cnts, np.float64)
            broads_f = np.asarray(broads, np.float64)
            halfs_f = np.asarray(halfs, np.float64)
            tights_f = np.asarray(tights, np.float64)
            vm_np = np.asarray(vm)
            ladder = (broads_f / thr_sq + halfs_f / half_sq
                      + tights_f / tight_sq)
            ranks = {
                "count": cnts_f,
                "msac1": -broads_f,
                "msac1n": -broads_f / np.maximum(cnts_f, 1),
                "msac05n": -halfs_f / np.maximum(cnts_f, 1),
                "msac025n": -tights_f / np.maximum(cnts_f, 1),
                "ladder": -ladder,
                "laddern": -ladder / np.maximum(cnts_f, 1),
                "lex": cnts_f - tights_f / (tight_sq * N),
            }
            # adapt: sigma from the msac05n winner's inlier residuals
            r05 = np.where(vm_np, ranks["msac05n"], -np.inf)
            w05 = int(np.argmax(r05))
            with jax.default_matmul_precision("highest"):
                med = float(med_inlier_err(Es[w05], x1n, x2n, inls[w05]))
                s_sq = float(np.clip(9.0 * med, 0.25 * thr_sq, thr_sq))
                al = np.asarray(losses_at(Es, x1n, x2n, mask,
                                          jnp.float32(s_sq)), np.float64)
            ranks["adapt"] = -al / np.maximum(cnts_f, 1)
            for v in variants:
                r = np.where(vm_np, ranks[v], -np.inf)
                b = int(np.argmax(r))
                with jax.default_matmul_precision("highest"):
                    rec = recover_pose_from_essential(
                        Es[b], x1n, x2n, inls[b],
                        cfg.ransac.distance_thresh)
                c = (np.trace(np.asarray(rec.R).T @ R_gt) - 1) / 2
                rot = float(np.degrees(np.arccos(np.clip(c, -1, 1))))
                tv = np.asarray(rec.t).ravel()
                tv = tv / (np.linalg.norm(tv) + 1e-12)
                te = float(np.degrees(np.arccos(
                    np.clip(abs(np.dot(tv, t_gt)), -1, 1))))
                out[v].append(rot)
                terr_out[v].append(te)

    print(f"{scene} {W}x{H} T={T} n_feat={n_feat} seeds={list(seeds)} "
          f"nuisance={nuisance}")
    for v in variants:
        r = np.array(out[v])
        te = np.array(terr_out[v])
        print(f"{v:9s}: rot mean {r.mean():6.3f} p90 "
              f"{np.percentile(r, 90):6.3f} max {r.max():7.3f} | "
              f"t mean {te.mean():6.2f} max {te.max():7.2f}")
    os.makedirs("benchmarks", exist_ok=True)
    suffix = "" if nuisance == "none" else f"_{nuisance}"
    path = f"benchmarks/score_variants_diag_{scene}_{W}x{H}{suffix}.json"
    with open(path, "w") as f:
        json.dump({"rot": out, "terr": terr_out,
                   "config": {"W": W, "H": H, "T": T, "n_feat": n_feat,
                              "scene": scene, "nuisance": nuisance}},
                  f, indent=1)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1241)
    p.add_argument("--height", type=int, default=376)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--features", type=int, default=2000)
    p.add_argument("--scene", default="corridor",
                   choices=["corridor", "pan"])
    p.add_argument("--nuisance", default="none", choices=["none", "blur"])
    a = p.parse_args()
    main(a.width, a.height, a.frames, a.features, scene=a.scene,
         nuisance=a.nuisance)
