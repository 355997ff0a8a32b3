"""Decompose find_essential_ransac into device-sustained substage times
at the runner's pair tiling (pc pairs vmapped, chunk-mapped over T-1).

Substages measured independently (each includes its own inputs only):
  draw+5pt   : sample draw + five_point_candidates for all max_iters
  dk_roots   : the Durand-Kerner root solve alone (isolated, same shapes)
  prescreen  : subset scoring of all hypotheses + top_k finalists
  fullscore  : full-set scoring of the finalists
  refit      : 8-point refit + one rescore
  full       : the whole find_essential_ransac

Usage: python tools/profile_ransac.py  (on the TPU host)
Env: PC (pair chunk, default 9), REPS (default 16), ITERS (ransac
max_iters, default 256), DK (Durand-Kerner iters to time, default 100).
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
from tpu_vo.estimation import ransac as R
from tpu_vo.estimation.five_point import (
    _constraint_matrix,
    _det_poly,
    _action_polynomials,
    _gauss_jordan,
    _newton_real,
    _nullspace_basis,
    _poly_roots,
    five_point_candidates,
    five_point_candidates_batched,
)
from tpu_vo.estimation.eight_point import estimate_essential_8pt
from tpu_vo.estimation.ransac import (
    _draw_samples,
    _score_msac,
    find_essential_ransac,
    pixel_threshold_to_normalized,
)
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.geometry.camera import intrinsics_from_image_size, normalize_points
from tpu_vo.matching.filter import adaptive_threshold_filter
from tpu_vo.matching.hamming import mutual_nearest_match
from tpu_vo.pipeline.runner import _chunked_map
from tpu_vo.utils.synthetic import make_sequence


def main():
    W, H, T = 1241, 376, 64
    pc = int(os.environ.get("PC", "9"))
    reps = int(os.environ.get("REPS", "16"))
    max_iters = int(os.environ.get("ITERS", "256"))
    dk_iters = int(os.environ.get("DK", "100"))
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200),
                   ransac=RansacConfig(max_iters=max_iters))
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

    def prep_fn(p, c):
        def one(args):
            pf, cf = args
            raw = mutual_nearest_match(pf.desc32, cf.desc32, pf.valid,
                                       cf.valid)
            good, _ = adaptive_threshold_filter(raw, cfg.match)
            p1 = pf.xy
            p2 = cf.xy[good.train_idx]
            return (normalize_points(p1, K), normalize_points(p2, K),
                    good.valid)
        return cmap(one, (p, c))

    x1n, x2n, mask = jax.jit(prep_fn)(prev, cur)
    x1n, x2n, mask = (x1n.block_until_ready(), x2n.block_until_ready(),
                      mask.block_until_ready())

    thr_sq = jnp.asarray(thr) ** 2
    score_sq = thr_sq * (rcfg.score_sigma_scale ** 2)

    def hp(fn):
        def wrapped(*a):
            with jax.default_matmul_precision("highest"):
                return fn(*a)
        return wrapped

    # --- substage closures ---------------------------------------------
    def draw5pt_fn(a, b, m, k):
        def one(args):
            x1, x2, mm, kk = args
            idx = _draw_samples(kk, mm, max_iters, 5)
            Es, vm = five_point_candidates_batched(x1[idx], x2[idx])
            return Es.reshape(-1, 3, 3), vm.reshape(-1)
        return cmap(hp(one), (a, b, m, k))

    Es, vms = jax.jit(draw5pt_fn)(x1n, x2n, mask, keys)
    Es, vms = Es.block_until_ready(), vms.block_until_ready()

    # nullspace -> poly coefficients, isolated (to separate from DK)
    def poly_fn(a, b, m, k):
        def one(args):
            x1, x2, mm, kk = args
            idx = _draw_samples(kk, mm, max_iters, 5)
            s1, s2 = x1[idx], x2[idx]

            def coeffs(p1, p2):
                basis = _nullspace_basis(p1, p2)
                A = _constraint_matrix(basis)
                sc = jnp.max(jnp.abs(A), axis=1, keepdims=True)
                A = A / jnp.maximum(sc, 1e-30)
                Ared = _gauss_jordan(A)
                B = _action_polynomials(Ared[:, 10:])
                return _det_poly(B)

            return jax.vmap(coeffs)(s1, s2)
        return cmap(hp(one), (a, b, m, k))

    polys = jax.jit(poly_fn)(x1n, x2n, mask, keys)
    polys = polys.block_until_ready()

    def dk_fn(p):
        def one(pp):
            def per_sample(c):
                roots, ok = _poly_roots(c, iters=dk_iters)
                z = _newton_real(c, jnp.real(roots))
                return z, ok
            return jax.vmap(per_sample)(pp)
        return cmap(hp(one), p)

    def prescreen_fn(a, b, m, es, vm):
        def one(args):
            x1, x2, mm, E, v = args
            order = jnp.argsort(~mm)
            sub = order[:128]
            x1s, x2s, ms = x1[sub], x2[sub], mm[sub]
            _, sub_loss = jax.vmap(
                _score_msac, in_axes=(0, None, None, None, None, None)
            )(E, x1s, x2s, ms, thr_sq, score_sq)
            rank = jnp.where(v, -sub_loss, -jnp.inf)
            _, top = jax.lax.top_k(rank, 16)
            return E[top], v[top]
        return cmap(hp(one), (a, b, m, es, vm))

    Ef, vf = jax.jit(prescreen_fn)(x1n, x2n, mask, Es, vms)
    Ef, vf = Ef.block_until_ready(), vf.block_until_ready()

    def fullscore_fn(a, b, m, es, vm):
        def one(args):
            x1, x2, mm, E, v = args
            inl, losses = jax.vmap(
                _score_msac, in_axes=(0, None, None, None, None, None)
            )(E, x1, x2, mm, thr_sq, score_sq)
            losses = jnp.where(v, losses, jnp.inf)
            best = jnp.argmin(losses)
            return E[best], inl[best], losses[best]
        return cmap(hp(one), (a, b, m, es, vm))

    Eb, inlb, lb = jax.jit(fullscore_fn)(x1n, x2n, mask, Ef, vf)
    Eb, inlb = Eb.block_until_ready(), inlb.block_until_ready()

    def refit_fn(a, b, m, e, inl):
        def one(args):
            x1, x2, mm, E, il = args
            E_ref = estimate_essential_8pt(x1, x2, il)
            inl_ref, loss_ref = _score_msac(E_ref, x1, x2, mm, thr_sq,
                                            score_sq)
            return E_ref, inl_ref, loss_ref
        return cmap(hp(one), (a, b, m, e, inl))

    def full_fn(a, b, m, k):
        def one(args):
            with jax.default_matmul_precision("highest"):
                res = find_essential_ransac(
                    args[0], args[1], args[2], args[3], thr,
                    max_iters=max_iters,
                    use_five_point=rcfg.use_five_point,
                    score=rcfg.score_method,
                    score_sigma_scale=rcfg.score_sigma_scale)
            return res.E, res.inliers, res.num_inliers, res.success
        return cmap(one, (a, b, m, k))

    print(f"P={P} pc={pc} reps={reps} max_iters={max_iters} dk={dk_iters}",
          flush=True)

    def report(name, t):
        print(f"{name:12s}: {t:8.2f} ms ({t/P:6.3f} ms/pair)", flush=True)

    report("poly(no-DK)", device_time_ms(poly_fn, x1n, x2n, mask, keys,
                                         reps=reps))
    report("dk_roots", device_time_ms(dk_fn, polys, reps=reps))
    report("draw+5pt", device_time_ms(draw5pt_fn, x1n, x2n, mask, keys,
                                      reps=reps))
    report("prescreen", device_time_ms(prescreen_fn, x1n, x2n, mask, Es, vms,
                                       reps=reps))
    report("fullscore", device_time_ms(fullscore_fn, x1n, x2n, mask, Ef, vf,
                                       reps=reps))
    report("refit", device_time_ms(refit_fn, x1n, x2n, mask, Eb, inlb,
                                   reps=reps))
    report("full ransac", device_time_ms(full_fn, x1n, x2n, mask, keys,
                                         reps=reps))


if __name__ == "__main__":
    main()
