"""Decompose the ORB frontend (detect_and_compute at the bench tiling,
fc frames vmapped) into device-sustained substage times.

Substages (each chunk-mapped at fc like the runner):
  pyramid    : 8-level banded-MXU resize
  select     : per-level fused FAST/NMS/Harris kernel + stage-1/2 top-k
  patches    : DMA window extraction for all levels
  angle+desc : orientation moments + steered rBRIEF bits from patches
  pack       : bit packing + concat + gathers into ORBFeatures
  full       : detect_and_compute

NOTE on the floor: device_time_ms pays one ~25-30 ms host<->device round
trip per *call* regardless of reps (remote tunnel); at reps=R that adds
~28/R ms to every number. Use REPS>=32 for sub-ms substages.

Usage: python tools/profile_features.py  (on the TPU host)
Env: FC (frame chunk, default 8), REPS (default 32).
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
from tpu_vo.features import patches
from tpu_vo.features.orb import (
    _select_level_keypoints,
    detect_and_compute,
    features_per_level,
)
from tpu_vo.features import brief, fast
from tpu_vo.image.pyramid import build_pyramid
from tpu_vo.pipeline.runner import _chunked_map
from tpu_vo.utils.synthetic import make_sequence


def main():
    W, H, T = 1241, 376, 64
    fc = int(os.environ.get("FC", "8"))
    reps = int(os.environ.get("REPS", "32"))
    cfg = ORBConfig(n_features=1200)
    budgets = features_per_level(cfg.n_features, cfg.n_levels,
                                 cfg.scale_factor)

    frames_np, _, _, _ = make_sequence(n_frames=T, width=W, height=H, seed=0)
    frames = jax.device_put(np.stack(frames_np).astype(np.float32))

    def cmap(fn, xs):
        return _chunked_map(fn, xs, fc)

    def pyramid_fn(f):
        return cmap(lambda x: tuple(
            build_pyramid(x, cfg.n_levels, cfg.scale_factor)), f)

    levels = jax.jit(pyramid_fn)(frames)
    levels = jax.tree.map(lambda a: a.block_until_ready(), levels)

    def select_fn(lvls):
        def one(ls):
            out = []
            for lvl, n_level in zip(ls, budgets):
                if n_level <= 0:
                    continue
                out.append(_select_level_keypoints(lvl, n_level, cfg))
            return tuple(out)
        return cmap(one, lvls)

    sel = jax.jit(select_fn)(levels)
    sel = jax.tree.map(lambda a: a.block_until_ready(), sel)

    def patches_fn(lvls, sel):
        def one(args):
            ls, ss = args
            raws = []
            for lvl, (ys, xs, _, _) in zip(ls, ss):
                if fast._use_pallas():
                    from tpu_vo.ops.patch_pallas import extract_patches_pallas
                    raws.append(extract_patches_pallas(lvl, ys, xs))
                else:
                    raws.append(patches.extract_patches(lvl, ys, xs))
            return tuple(raws)
        return cmap(one, (lvls, sel))

    raws = jax.jit(patches_fn)(levels, sel)
    raws = jax.tree.map(lambda a: a.block_until_ready(), raws)

    def angdesc_fn(rw):
        def one(rs):
            outs = []
            for raw in rs:
                ang = patches.angles_from_patches(raw)
                outs.append((ang, patches.descriptor_bits_from_patches(
                    raw, ang)))
            return tuple(outs)
        return cmap(one, rw)

    ad = jax.jit(angdesc_fn)(raws)
    ad = jax.tree.map(lambda a: a.block_until_ready(), ad)

    def pack_fn(ad_in, sel):
        def one(args):
            ads, ss = args
            bits = jnp.concatenate([b for _, b in ads])
            valid = jnp.concatenate([v for _, _, _, v in ss])
            d8 = jnp.where(valid[:, None], brief.pack_bits_u8(bits), 0)
            d32 = jnp.where(valid[:, None], brief.pack_bits_u32(bits), 0)
            return d8, d32
        return cmap(one, (ad_in, sel))

    def full_fn(f):
        return cmap(lambda x: detect_and_compute(x, cfg), f)

    print(f"T={T} fc={fc} reps={reps} (floor ~{28.0/reps:.2f} ms/call)",
          flush=True)

    def report(name, t):
        print(f"{name:10s}: {t:8.2f} ms ({t/T:6.3f} ms/frame)", flush=True)

    report("pyramid", device_time_ms(pyramid_fn, frames, reps=reps))
    report("select", device_time_ms(select_fn, levels, reps=reps))
    report("patches", device_time_ms(patches_fn, levels, sel, reps=reps))
    report("angle+desc", device_time_ms(angdesc_fn, raws, reps=reps))
    report("pack", device_time_ms(pack_fn, ad, sel, reps=reps))
    report("full", device_time_ms(full_fn, frames, reps=reps))


if __name__ == "__main__":
    main()
