"""Micro-decomposition of five_point_candidates' polynomial pipeline at
the production batch (pc pairs x max_iters samples, vmapped like the
runner). Finds which of nullspace / constraint-matrix / Gauss-Jordan /
det-poly / Durand-Kerner dominates the 0.20 ms/pair poly cost.

Usage: python tools/profile_5pt_micro.py  (on the TPU host)
Env: PC (default 9), ITERS (default 256), REPS (default 16).
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
from tpu_vo.estimation.five_point import (
    _action_polynomials,
    _constraint_matrix,
    _det_poly,
    _gauss_jordan,
    _newton_real,
    _nullspace_basis,
    _poly_roots,
)


def main():
    pc = int(os.environ.get("PC", "9"))
    iters = int(os.environ.get("ITERS", "256"))
    reps = int(os.environ.get("REPS", "16"))
    B = pc * iters

    key = jax.random.PRNGKey(0)
    s1 = jax.random.normal(key, (B, 5, 2), jnp.float32) * 0.3
    s2 = s1 + jax.random.normal(jax.random.PRNGKey(1), (B, 5, 2)) * 0.02

    def hp(fn):
        def wrapped(*a):
            with jax.default_matmul_precision("highest"):
                return fn(*a)
        return wrapped

    nullspace = hp(jax.vmap(_nullspace_basis))
    basis = jax.jit(nullspace)(s1, s2)
    basis = basis.block_until_ready()

    constraint = hp(jax.vmap(_constraint_matrix))
    A = jax.jit(constraint)(basis)
    A = A.block_until_ready()

    def gj(Ain):
        sc = jnp.max(jnp.abs(Ain), axis=-1, keepdims=True)
        return _gauss_jordan(Ain / jnp.maximum(sc, 1e-30))

    gauss = hp(jax.vmap(gj))
    Ared = jax.jit(gauss)(A)
    Ared = Ared.block_until_ready()

    def dp(Ared1):
        return _det_poly(_action_polynomials(Ared1[:, 10:]))

    detp = hp(jax.vmap(dp))
    polys = jax.jit(detp)(Ared)
    polys = polys.block_until_ready()

    def dk(pp):
        def per_sample(c):
            roots, ok = _poly_roots(c)
            return _newton_real(c, jnp.real(roots)), ok
        return jax.vmap(per_sample)(pp)

    dk = hp(dk)

    print(f"B={B} (pc={pc} x iters={iters}) reps={reps}", flush=True)

    def report(name, t):
        print(f"{name:12s}: {t:8.3f} ms ({t/pc:7.4f} ms/pair-equiv)",
              flush=True)

    report("nullspace", device_time_ms(nullspace, s1, s2, reps=reps))
    report("constraint", device_time_ms(constraint, basis, reps=reps))
    report("gauss-jordan", device_time_ms(gauss, A, reps=reps))
    report("det-poly", device_time_ms(detp, Ared, reps=reps))
    report("dk+newton", device_time_ms(dk, polys, reps=reps))


if __name__ == "__main__":
    main()
