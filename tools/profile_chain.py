"""Micro-benchmark pose-chaining variants on TPU at trajectory scale.

Variants:
  doubling  : se3.cumulative_compose (Hillis-Steele, log-depth matmuls)
  assoc     : jax.lax.associative_scan of se3.compose
  scan      : serial lax.scan of compose (63 sequential tiny matmuls)
  soa       : doubling with unrolled 3x3 products, pose axis on lanes
  full      : chain_relative_poses (invert + gates + doubling + concat)

Usage: python tools/profile_chain.py  (on the TPU host)
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
from tpu_vo.configs import VOConfig
from tpu_vo.geometry import se3
from tpu_vo.pipeline.runner import chain_relative_poses


def soa_cumulative(R, t):
    """Doubling scan with the pose axis minor-most and unrolled 3x3 math."""
    Rs = jnp.moveaxis(R, 0, -1)          # (3, 3, n)
    ts = jnp.moveaxis(t, 0, -1)          # (3, n)
    n = R.shape[0]

    def compose(Ra, ta, Rb, tb):
        Rn = jnp.einsum("ikn,kjn->ijn", Ra, Rb)
        tn = jnp.einsum("ikn,kn->in", Ra, tb) + ta
        return Rn, tn

    d = 1
    while d < n:
        Ra, ta = Rs[..., :-d], ts[..., :-d]
        Rb, tb = Rs[..., d:], ts[..., d:]
        Rc, tc = compose(Ra, ta, Rb, tb)
        Rs = jnp.concatenate([Rs[..., :d], Rc], axis=-1)
        ts = jnp.concatenate([ts[..., :d], tc], axis=-1)
        d *= 2
    return jnp.moveaxis(Rs, -1, 0), jnp.moveaxis(ts, -1, 0)


def main():
    n = int(os.environ.get("N", "63"))
    reps = int(os.environ.get("REPS", "64"))
    cfg = VOConfig(image_width=1241, image_height=376)

    rng = np.random.RandomState(0)
    ax = rng.randn(n, 3)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    R = np.asarray(se3.rotation_from_axis_angle(
        jnp.asarray(ax, jnp.float32), jnp.asarray(rng.rand(n) * 0.2,
                                                  jnp.float32)))
    t = rng.randn(n, 3).astype(np.float32) * 0.1
    have = np.ones(n, bool)
    ok = np.ones(n, bool)
    R, t = jnp.asarray(R), jnp.asarray(t)
    have, ok = jnp.asarray(have), jnp.asarray(ok)

    def doubling(R, t):
        p = se3.cumulative_compose(se3.Pose(R, t))
        return p.R, p.t

    def assoc(R, t):
        p = jax.lax.associative_scan(
            lambda a, b: se3.compose(a, b), se3.Pose(R, t), axis=0)
        return p.R, p.t

    def scan(R, t):
        def body(carry, rel):
            p = se3.compose(carry, se3.Pose(rel[0], rel[1]))
            return p, (p.R, p.t)
        _, out = jax.lax.scan(body, se3.Pose.identity(dtype=jnp.float32),
                              (R, t))
        return out

    def full(R, t, have, ok):
        p = chain_relative_poses(R, t, have, ok, cfg)
        return p.R, p.t

    print(f"n={n} reps={reps}", flush=True)
    for name, fn, args in [
        ("doubling", doubling, (R, t)),
        ("soa", soa_cumulative, (R, t)),
        ("assoc", assoc, (R, t)),
        ("scan", scan, (R, t)),
        ("full", full, (R, t, have, ok)),
    ]:
        print(f"{name:9s}: {device_time_ms(fn, *args, reps=reps):7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
