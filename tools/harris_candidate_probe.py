"""A/B the per-candidate patch-Harris proposal (VERDICT r4 next #8).

The roofline names select (0.385 ms, VPU-pass-bound) as the biggest
stage line; Harris is ~35 of its ~130 passes, computed densely although
stage 2 only ranks the <=2n stage-1 survivors per level. The proposal:
drop dense Harris from the kernel and compute it per candidate through
the DMA patch machinery. Full accounting of variant B (with maximal
reuse — candidate patches cover the stage-2 winners, so the current
winner extraction is saved):

    net = S + P1 - (P2 + Hc)
      S  = select(with_harris) - select(without): the dense-Harris share
      P1 = patch extraction at n_level winners/level (saved by reuse)
      P2 = patch extraction at 2*n_level candidates/level (new cost)
      Hc = center Harris from the candidate patches (VPU, tiny)

Random coordinates/content: all stages are data-independent in time.
Run on the TPU host; writes benchmarks/harris_candidate_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pyramid_shapes(W, H, n_levels=8, sf=1.2):
    shapes = []
    for lv in range(n_levels):
        s = 1.0 / (sf ** lv)
        shapes.append((int(round(H * s)), int(round(W * s))))
    return shapes


def center_harris_from_patches(raw):
    """Harris response at the patch center (k, 48, 128) -> (k,).

    Same math as features/harris.harris_at scoped to the 9x9 window the
    7x7 box + Sobel needs around the 43x43 patch center (21, 21)."""
    import jax.numpy as jnp

    win = raw[:, 16:27, 16:27].astype(jnp.float32)   # (k, 11, 11)

    def at(dy, dx):
        return win[:, 1 + dy:10 + dy, 1 + dx:10 + dx]  # (k, 9, 9)

    Ix = ((at(0, 1) - at(0, -1)) * 2.0
          + (at(-1, 1) - at(-1, -1)) + (at(1, 1) - at(1, -1)))
    Iy = ((at(1, 0) - at(-1, 0)) * 2.0
          + (at(1, -1) - at(-1, -1)) + (at(1, 1) - at(-1, 1)))
    a = jnp.sum((Ix * Ix)[:, 1:8, 1:8], axis=(1, 2))
    b = jnp.sum((Iy * Iy)[:, 1:8, 1:8], axis=(1, 2))
    c = jnp.sum((Ix * Iy)[:, 1:8, 1:8], axis=(1, 2))
    scale4 = jnp.float32((1.0 / ((1 << 2) * 7 * 255.0)) ** 4)
    return (a * b - c * c - 0.04 * (a + b) * (a + b)) * scale4


def main(argv=None):
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tools.device_time import device_time_ms
    from tpu_vo.features.orb import features_per_level
    from tpu_vo.ops.patch_pallas import extract_patches_pallas
    from tpu_vo.ops.select_pallas import fused_select_maps

    W, H = 1241, 376
    shapes = _pyramid_shapes(W, H)
    budgets = features_per_level(1200, 8, 1.2)
    rng = np.random.default_rng(0)
    levels = [jax.device_put(rng.uniform(0, 255, (h, w)).astype(np.float32))
              for h, w in shapes]

    results = {}

    def select_all(with_harris):
        def run(lvls):
            outs = []
            for lvl in lvls:
                p, hr, _ = fused_select_maps(lvl, 10, 31,
                                             with_harris=with_harris)
                outs.append((p, hr if with_harris else p))
            return outs
        return device_time_ms(run, levels, reps=256, iters=3)

    a_with = select_all(True)
    a_without = select_all(False)
    S = a_with - a_without
    results["select_with_harris_ms"] = round(a_with, 4)
    results["select_no_harris_ms"] = round(a_without, 4)
    results["dense_harris_share_ms"] = round(S, 4)
    print(json.dumps(results), flush=True)

    def patches_at(mult):
        slots = []
        for (h, w), n in zip(shapes, budgets):
            k = min(mult * n, h * w)
            ys = jnp.asarray(rng.integers(31, h - 31, k), jnp.int32)
            xs = jnp.asarray(rng.integers(31, w - 31, k), jnp.int32)
            slots.append((ys, xs))

        def run(lvls):
            return [extract_patches_pallas(lvl, ys, xs)
                    for lvl, (ys, xs) in zip(lvls, slots)]
        return device_time_ms(run, levels, reps=256, iters=3), slots

    P1, _ = patches_at(1)
    P2, slots2 = patches_at(2)
    results["patches_winners_ms"] = round(P1, 4)
    results["patches_candidates_ms"] = round(P2, 4)

    def run_hc(lvls):
        return [center_harris_from_patches(
            extract_patches_pallas(lvl, ys, xs))
            for lvl, (ys, xs) in zip(lvls, slots2)]
    Hc = device_time_ms(run_hc, levels, reps=256, iters=3) - P2
    results["center_harris_ms"] = round(max(Hc, 0.0), 4)

    net = S + P1 - (P2 + max(Hc, 0.0))
    results["net_win_ms"] = round(net, 4)
    results["verdict"] = ("KEEP: candidate Harris wins" if net > 0.15 * a_with
                          else "NEGATIVE: dense in-kernel Harris stays")
    print(json.dumps(results), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "harris_candidate_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
