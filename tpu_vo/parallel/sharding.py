"""Sharded VO runners: data parallelism over sequences, sequence
parallelism over frames.

Mapping of the required parallelism strategies (SURVEY.md §2c) onto VO:

  - DP   ("data" axis): independent sequences sharded across devices; no
    cross-device communication at all — each device runs its own batched
    pipeline (BASELINE.json config 4).
  - SP   ("seq" axis): one long sequence sharded along time. Feature
    extraction is embarrassingly frame-parallel; the pair stage needs each
    device to see its right neighbor's first frame (a halo of one), and
    pose chaining is a `jax.lax.associative_scan`, which XLA lowers to a
    log-depth blocked scan with ICI collectives between shards. We express
    shardings with NamedSharding and let XLA insert the halo exchange and
    scan collectives.
  - TP/PP/EP: no large weights / stages / experts in VO; N/A (documented
    in SURVEY.md §2c).

All entry points also run on a single device (mesh of 1) unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_vo.configs import VOConfig
from tpu_vo.pipeline.runner import run_sequence_batched


@functools.lru_cache(maxsize=None)
def _batch_runner(cfg: VOConfig, mesh: Mesh,
                  frame_chunk: Optional[int], pair_chunk: Optional[int]):
    """Cached jitted runner — rebuilding the closure per call would defeat
    jax's jit cache and recompile the full pipeline every invocation."""
    def one(seq, seed_arr):
        return run_sequence_batched(
            seq, cfg, seed=seed_arr,
            frame_chunk=frame_chunk, pair_chunk=pair_chunk,
        )

    in_shard = (
        NamedSharding(mesh, P("data", None, None, None)),
        NamedSharding(mesh, P("data")),
    )
    return jax.jit(jax.vmap(one), in_shardings=in_shard)


def run_batch_of_sequences(frames: jax.Array, cfg: VOConfig, mesh: Mesh,
                           seed: int = 0,
                           frame_chunk: Optional[int] = None,
                           pair_chunk: Optional[int] = None):
    """VO over a (B, T, H, W) batch of sequences, B sharded on "data".

    Each sequence runs the full batched pipeline; vmap over the batch axis
    with the batch dimension sharded gives pure data parallelism (zero
    collectives — throughput scales linearly with devices).
    Returns (poses (B, T), diagnostics dict of (B, T-1) arrays).
    """
    B = frames.shape[0]
    seeds = jnp.arange(B, dtype=jnp.uint32) + jnp.uint32(seed)
    fn = _batch_runner(cfg, mesh, frame_chunk, pair_chunk)
    return fn(frames, seeds)


@functools.lru_cache(maxsize=None)
def _time_sharded_runner(cfg: VOConfig, mesh: Mesh, seed: int, axis: str):
    shard = NamedSharding(mesh, P(axis, None, None))
    return jax.jit(
        functools.partial(run_sequence_batched, cfg=cfg, seed=seed),
        in_shardings=(shard,),
    ), shard


def run_sequence_time_sharded(frames: jax.Array, cfg: VOConfig, mesh: Mesh,
                              seed: int = 0,
                              axis: str = "seq"):
    """One (T, H, W) sequence with the time axis sharded over `axis`.

    The pair stage's prev/cur slicing introduces a one-frame halo which
    XLA satisfies with a neighbor ppermute; the associative pose scan
    lowers to blocked scans + inter-shard combines on ICI.
    """
    fn, shard = _time_sharded_runner(cfg, mesh, seed, axis)
    frames = jax.device_put(frames, shard)
    return fn(frames)
