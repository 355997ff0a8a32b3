"""Durand-Kerner iteration-budget diagnostic for the SoA 5-point solver.

For real corridor-pair samples, compares candidate sets at reduced DK
budgets against the 100-iteration baseline: valid-slot agreement, max
candidate-E deviation on commonly-valid slots, and the per-budget
device-sustained time of the hypothesize stage.

Usage: python tools/dk_iters_diag.py  (on the TPU host)
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
from tpu_vo.configs import ORBConfig, VOConfig
from tpu_vo.estimation.five_point import five_point_candidates_batched
from tpu_vo.estimation.ransac import _draw_samples
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.geometry.camera import intrinsics_from_image_size, normalize_points
from tpu_vo.matching.filter import adaptive_threshold_filter
from tpu_vo.matching.hamming import mutual_nearest_match
from tpu_vo.pipeline.runner import _chunked_map
from tpu_vo.utils.synthetic import make_sequence


def main():
    W, H, T = 1241, 376, 16
    iters = 256
    cfg = VOConfig(image_width=W, image_height=H,
                   orb=ORBConfig(n_features=1200))
    K = intrinsics_from_image_size(W, H)

    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    frames = jax.device_put(np.stack(frames_np))
    feats = jax.jit(lambda f: _chunked_map(
        lambda x: detect_and_compute(x, cfg.orb), f, 8))(frames)
    prev = jax.tree.map(lambda a: a[:-1], feats)
    cur = jax.tree.map(lambda a: a[1:], feats)

    def prep(p, c):
        def one(args):
            pf, cf = args
            raw = mutual_nearest_match(pf.desc32, cf.desc32, pf.valid,
                                       cf.valid)
            good, _ = adaptive_threshold_filter(raw, cfg.match)
            return (normalize_points(pf.xy, K),
                    normalize_points(cf.xy[good.train_idx], K), good.valid)
        return _chunked_map(one, (p, c), 5)

    x1n, x2n, mask = jax.jit(prep)(prev, cur)

    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, T, dtype=jnp.int32))

    def samples(x1, x2, mm, kk):
        idx = _draw_samples(kk, mm, iters, 5)
        return x1[idx], x2[idx]

    s1, s2 = jax.jit(jax.vmap(samples))(x1n, x2n, mask, keys)
    s1 = s1.reshape(-1, 5, 2)
    s2 = s2.reshape(-1, 5, 2)
    print(f"samples: {s1.shape[0]}", flush=True)

    def run(it, method):
        def f(a, b):
            with jax.default_matmul_precision("highest"):
                return five_point_candidates_batched(
                    a, b, dk_iters=it, root_method=method)
        return jax.jit(f)

    Es_ref, v_ref = run(100, "dk")(s1, s2)
    Es_ref, v_ref = np.asarray(Es_ref), np.asarray(v_ref)
    t_ref = device_time_ms(lambda a, b: run(100, "dk")(a, b), s1, s2,
                           reps=16)
    print(f"baseline dk=100: valid slots {v_ref.sum()} "
          f"({v_ref.mean():.3f}/slot) time={t_ref:.2f} ms", flush=True)

    # Slot order is iteration-dependent (both methods converge roots into
    # arbitrary slot positions), so compare candidate SETS per sample:
    # each baseline-valid E must have a sign-invariant match among the
    # trial's valid slots, and vice versa.
    def set_match(Es, v):
        d = np.minimum(
            np.abs(Es[:, :, None] - Es_ref[:, None, :]).reshape(
                Es.shape[0], 10, 10, -1).max(-1),
            np.abs(Es[:, :, None] + Es_ref[:, None, :]).reshape(
                Es.shape[0], 10, 10, -1).max(-1),
        )                                    # (S, trial_slot, ref_slot)
        tol = 1e-2
        pair_ok = d < tol
        ref_found = (pair_ok & v[:, :, None]).any(1)    # ref slot matched
        new_found = (pair_ok & v_ref[:, None, :]).any(2)
        lost = int((v_ref & ~ref_found).sum())
        spurious = int((v & ~new_found).sum())
        return lost, spurious

    for method, its in (("dk", (60, 40)), ("aberth", (40, 30, 24, 16, 12))):
        for it in its:
            Es, v = run(it, method)(s1, s2)
            Es, v = np.asarray(Es), np.asarray(v)
            lost, spurious = set_match(Es, v)
            t = device_time_ms(
                lambda a, b, it=it, m=method: run(it, m)(a, b),
                s1, s2, reps=16)
            print(f"{method:6s} it={it:3d}: valid={v.sum()} "
                  f"lost={lost} ({lost/max(v_ref.sum(),1):.4f}) "
                  f"spurious={spurious} time={t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
