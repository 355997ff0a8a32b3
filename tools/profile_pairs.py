"""Decompose the pair-estimation stage (matching -> RANSAC -> recoverPose
-> F/residual diagnostics) into device-sustained per-substage times, at
the same batch tiling the headline runner uses (pair_chunk=9 over T-1=63
pairs). Finds where estimate_pair's measured ~1.1 ms/pair goes vs the
stage table's ~0.4 ms sum of isolated ops.

Usage: python tools/profile_pairs.py  (on the TPU host)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from tools.device_time import device_time_ms
from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
from tpu_vo.estimation.ransac import (
    find_essential_ransac,
    pixel_threshold_to_normalized,
)
from tpu_vo.estimation.recover_pose import recover_pose_from_essential
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.geometry.camera import intrinsics_from_image_size, normalize_points
from tpu_vo.geometry.epipolar import algebraic_residual, fundamental_from_essential
from tpu_vo.matching.filter import adaptive_threshold_filter
from tpu_vo.matching.hamming import mutual_nearest_match
from tpu_vo.pipeline.runner import _chunked_map
from tpu_vo.pipeline.step import estimate_pair
from tpu_vo.utils.synthetic import make_sequence


def main():
    W, H, T = 1241, 376, 64
    pc = int(os.environ.get("PC", "9"))
    reps = int(os.environ.get("REPS", "16"))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200),
                   ransac=RansacConfig(max_iters=256))
    K = intrinsics_from_image_size(W, H)
    rcfg = cfg.ransac
    thr = pixel_threshold_to_normalized(rcfg.threshold_px, K)

    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    frames = jax.device_put(np.stack(frames_np))
    feats = jax.jit(lambda f: _chunked_map(
        lambda x: detect_and_compute(x, cfg.orb), f, 8))(frames)
    feats = jax.tree.map(lambda a: a.block_until_ready(), feats)

    prev = jax.tree.map(lambda a: a[:-1], feats)
    cur = jax.tree.map(lambda a: a[1:], feats)
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, T, dtype=jnp.int32))
    P = T - 1

    def cmap(fn, xs):
        return _chunked_map(fn, xs, pc)

    # --- substage closures, each chunk-mapped like the runner -------------
    def match_fn(p, c):
        def one(args):
            pf, cf = args
            raw = mutual_nearest_match(pf.desc32, cf.desc32, pf.valid, cf.valid)
            good, stats = adaptive_threshold_filter(raw, cfg.match)
            return good.train_idx, good.valid, stats
        return cmap(one, (p, c))

    def prep_fn(p, c):
        ti, gv, _ = match_fn(p, c)
        def one(args):
            pf, cf, t, v = args
            p1 = pf.xy
            p2 = cf.xy[t]
            return normalize_points(p1, K), normalize_points(p2, K), v
        return cmap(one, (p, c, ti, gv))

    x1n, x2n, mask = jax.jit(prep_fn)(prev, cur)
    x1n, x2n, mask = (x1n.block_until_ready(), x2n.block_until_ready(),
                      mask.block_until_ready())

    def ransac_fn(a, b, m, k):
        def one(args):
            with jax.default_matmul_precision("highest"):
                res = find_essential_ransac(
                    args[0], args[1], args[2], args[3], thr,
                    max_iters=rcfg.max_iters,
                    use_five_point=rcfg.use_five_point,
                    score=rcfg.score_method,
                    score_sigma_scale=rcfg.score_sigma_scale)
            return res.E, res.inliers, res.num_inliers, res.success
        return cmap(one, (a, b, m, k))

    E, inl, n_inl, succ = jax.jit(ransac_fn)(x1n, x2n, mask, keys)
    E, inl = E.block_until_ready(), inl.block_until_ready()

    def recover_fn(e, a, b, m):
        def one(args):
            with jax.default_matmul_precision("highest"):
                rec = recover_pose_from_essential(
                    args[0], args[1], args[2], args[3], rcfg.distance_thresh)
            return rec.R, rec.t, rec.num_valid
        return cmap(one, (e, a, b, m))

    def diag_fn(e, p, c, m):
        def one(args):
            ee, pf, cf, mm = args
            F = fundamental_from_essential(ee, K)
            resid = algebraic_residual(F, pf.xy, cf.xy)
            n = jnp.maximum(jnp.sum(mm), 1)
            return F, jnp.sum(jnp.where(mm, resid, 0.0)) / n
        return cmap(one, (e, p, c, m))

    def full_fn(p, c, k):
        return cmap(lambda args: estimate_pair(args[0], args[1], args[2], cfg),
                    (p, c, k))

    print(f"P={P} pc={pc} reps={reps} max_iters={rcfg.max_iters}", flush=True)

    def report(name, t):
        print(f"{name:19s}: {t:8.2f} ms ({t/P:6.3f} ms/pair)", flush=True)

    report("match+filter", device_time_ms(match_fn, prev, cur, reps=reps))
    report("+gather+normalize", device_time_ms(prep_fn, prev, cur, reps=reps))
    report("ransac",
           device_time_ms(ransac_fn, x1n, x2n, mask, keys, reps=reps))
    report("recover_pose", device_time_ms(recover_fn, E, x1n, x2n, inl,
                                          reps=reps))
    report("F+residual diag", device_time_ms(diag_fn, E, prev, cur, inl,
                                             reps=reps))
    report("full estimate_pair",
           device_time_ms(full_fn, prev, cur, keys, reps=reps))


if __name__ == "__main__":
    main()
