"""Device-side timing harness immune to dispatch/tunnel overhead.

Measuring single ops with host-side wall clocks is unreliable over the
remote-TPU (axon) tunnel: per-call dispatch latency and host->device
buffer re-uploads can dwarf sub-millisecond device times. This harness
runs the op R times inside one lax.fori_loop in a SINGLE dispatch, with a
scalar carry threaded through every iteration so the loop cannot be
CSE'd/hoisted, and divides total wall time by R.

The carry injection adds one scalar-broadcast add over the first input
per iteration (~one HBM pass); report_overhead() measures that floor.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from tpu_vo.utils.profiling import fence


def _tree_scalar(out) -> jax.Array:
    """Cheap scalar data-dependent on every output leaf."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0.0)
    for leaf in leaves:
        # full reduction: every output element must feed the carry, or XLA
        # dead-code-eliminates all work not reachable from a sampled slice
        # (elementwise pipelines collapse to computing one pixel).
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def device_time_ms(fn, *args, reps: int = 32, iters: int = 5,
                   warmup: int = 2) -> float:
    """Median wall time of fn(*args) in ms, measured as one R-rep loop."""

    def looped(*a):
        leaves, treedef = jax.tree_util.tree_flatten(a)

        def body(_, carry):
            acc, rest = carry
            first = rest[0]
            # acc*1e-30 is not compile-time foldable (acc is loop-carried)
            # but rounds to zero at runtime for any image-scale data, so
            # the measured op sees unchanged values while the loop keeps a
            # true data dependence that defeats hoisting/DCE.
            eps = (acc * jnp.float32(1e-30)).astype(first.dtype)
            bumped = [first + eps] + list(rest[1:])
            out = fn(*jax.tree_util.tree_unflatten(treedef, bumped))
            return (acc + _tree_scalar(out), rest)

        final, _ = jax.lax.fori_loop(
            0, reps, body, (jnp.float32(0.0), tuple(leaves)))
        return final

    looped_j = jax.jit(looped)
    args = jax.tree_util.tree_map(jnp.asarray, args)
    fence(args)
    for _ in range(warmup):
        fence(looped_j(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(looped_j(*args))
        times.append((time.perf_counter() - t0) / reps * 1e3)
    return sorted(times)[len(times) // 2]


def overhead_ms(example: jax.Array, reps: int = 32) -> float:
    """Timing floor: the carry-injection add alone on `example`'s shape."""
    return device_time_ms(lambda x: x, example, reps=reps)
