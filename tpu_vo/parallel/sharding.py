"""Sharded VO runners: data parallelism over sequences, sequence
parallelism over frames — built on shard_map so the communication
pattern is explicit and guaranteed.

Mapping of the required parallelism strategies (SURVEY.md §2c) onto VO:

  - DP   ("data" axis): independent sequences sharded across devices.
    Expressed with `jax.shard_map`, so each device runs its own batched
    pipeline on its local sequences and the compiled program contains
    ZERO collectives by construction (tests/test_parallel.py asserts
    this on the lowered HLO). The earlier jit+NamedSharding formulation
    let XLA's SPMD partitioner all-gather the per-level FAST score maps
    across devices to satisfy `top_k` — image-scale traffic on a
    supposedly communication-free path.
  - SP   ("seq" axis): one long sequence sharded along time. Feature
    extraction is embarrassingly frame-parallel; the pair stage needs
    each device to see its LEFT neighbor's last-frame features (a halo
    of one), expressed as an explicit `lax.ppermute` of one feature
    set (~100 KB at 1200 kps) — the only inter-device transfer at
    feature scale. Pose chaining is a `lax.associative_scan` over the
    gathered per-pair (R, t) (3x3-sized combines on ICI).
  - TP/PP/EP: no large weights / stages / experts in VO; N/A (documented
    in SURVEY.md §2c).

All entry points also run on a single device (mesh of 1) unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_vo.configs import VOConfig
from tpu_vo.features.orb import detect_and_compute
from tpu_vo.pipeline.runner import chain_relative_poses, run_sequence_batched
from tpu_vo.pipeline.step import estimate_pair


@functools.lru_cache(maxsize=None)
def _batch_runner(cfg: VOConfig, mesh: Mesh,
                  frame_chunk: Optional[int], pair_chunk: Optional[int]):
    """Cached jitted runner — rebuilding the closure per call would defeat
    jax's jit cache and recompile the full pipeline every invocation.

    The per-device batch is FLATTENED across its local sequences before
    the stage maps, so frame_chunk/pair_chunk set the per-call batch
    GLOBALLY (chunk frames / chunk pairs per device program step)
    regardless of how many sequences the device holds. Round 4 instead
    vmapped run_sequence_batched over the local sequences, multiplying
    the per-call batch by B_local — config 4's fc=8/pc=15 became
    64-frame feature calls and 120-pair RANSAC calls, past the ~100-pair
    working-set cliff, costing 40% (tools/profile_batch8.py: 650 fps vs
    961 with deflated calls; VERDICT r4 next #1). Cross-sequence frame
    pairs are never formed: prev/cur are sliced per sequence before
    flattening, and each sequence keeps the exact per-sequence
    PRNGKey(seed)+fold_in(frame_idx) scheme of run_sequence_batched, so
    results are bit-identical to the vmapped formulation.
    """
    from tpu_vo.features.orb import detect_and_compute
    from tpu_vo.pipeline.runner import _chunked_map, chain_relative_poses
    from tpu_vo.pipeline.step import estimate_pair

    def local(frames_local, seeds_local):
        Bl, T = frames_local.shape[0], frames_local.shape[1]
        flat = frames_local.reshape((Bl * T,) + frames_local.shape[2:])
        feats = _chunked_map(
            lambda f: detect_and_compute(f, cfg.orb), flat, frame_chunk)
        feats = jax.tree.map(
            lambda a: a.reshape((Bl, T) + a.shape[1:]), feats)
        prev = jax.tree.map(
            lambda a: a[:, :-1].reshape((Bl * (T - 1),) + a.shape[2:]),
            feats)
        cur = jax.tree.map(
            lambda a: a[:, 1:].reshape((Bl * (T - 1),) + a.shape[2:]),
            feats)
        bases = jax.vmap(jax.random.PRNGKey)(seeds_local)
        idx = jnp.arange(1, T, dtype=jnp.int32)
        keys = jax.vmap(lambda b: jax.vmap(
            lambda i: jax.random.fold_in(b, i))(idx))(bases)
        keys = keys.reshape((Bl * (T - 1),) + keys.shape[2:])
        est = _chunked_map(
            lambda args: estimate_pair(args[0], args[1], args[2], cfg),
            (prev, cur, keys), pair_chunk)
        est = jax.tree.map(
            lambda a: a.reshape((Bl, T - 1) + a.shape[1:]), est)
        poses = jax.vmap(
            lambda R, t, h, ok: chain_relative_poses(R, t, h, ok, cfg))(
            est["R"], est["t"], est["have_rt"], est["pose_ok"])
        diags = {
            "num_keypoints": est["n_keypoints"],
            "num_matches": est["n_good"],
            "num_inliers": est["n_inliers"],
            "num_valid_points": est["n_valid_points"],
            "pose_ok": est["pose_ok"],
            "epipolar_residual": est["mean_residual"],
            "F": est["F"],
        }
        return poses, diags

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P("data"), P("data")),
                       out_specs=P("data"), check_vma=False)
    return jax.jit(fn)


def run_batch_of_sequences(frames: jax.Array, cfg: VOConfig, mesh: Mesh,
                           seed: int = 0,
                           frame_chunk: Optional[int] = None,
                           pair_chunk: Optional[int] = None):
    """VO over a (B, T, H, W) batch of sequences, B sharded on "data".

    Each device runs the full batched pipeline on its B/n_data local
    sequences, flattened so frame_chunk/pair_chunk are the per-call
    batch sizes independent of B (see _batch_runner); per-sequence
    RANSAC seeds ride along, also sharded. shard_map guarantees zero
    collectives — throughput scales linearly with devices. Returns
    (poses (B, T), diagnostics dict of (B, T-1) arrays).

    Chunks must divide the per-device totals: frame_chunk | B/n·T and
    pair_chunk | B/n·(T-1).
    """
    from tpu_vo.pipeline.runner import _validate_chunks

    _validate_chunks(frame_chunk, pair_chunk)
    B = frames.shape[0]
    seeds = jnp.arange(B, dtype=jnp.uint32) + jnp.uint32(seed)
    fn = _batch_runner(cfg, mesh, frame_chunk, pair_chunk)
    return fn(frames, seeds)


@functools.lru_cache(maxsize=None)
def _time_sharded_runner(cfg: VOConfig, mesh: Mesh, seed: int, axis: str):
    n = mesh.shape[axis]

    def local(frames_local, base):
        """Per-device slice: features for local frames + pair estimation
        with a one-frame halo from the left neighbor."""
        t_loc = frames_local.shape[0]
        feats = jax.vmap(
            lambda f: detect_and_compute(f, cfg.orb))(frames_local)
        last = jax.tree.map(lambda a: a[-1:], feats)
        # right-shift across devices: device d receives d-1's last-frame
        # features; device 0 receives zeros (all-invalid -> its first
        # pair is the dummy dropped below, matching the reference's
        # first-frame early return, visual_odometry.cpp:327-337)
        perm = [(i, i + 1) for i in range(n - 1)]
        left = jax.tree.map(
            lambda a: jax.lax.ppermute(a, axis, perm), last)
        prev = jax.tree.map(
            lambda l, a: jnp.concatenate([l, a[:-1]], axis=0), left, feats)
        # per-global-frame RANSAC keys, same scheme as the batched runner
        i0 = jax.lax.axis_index(axis) * t_loc
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            i0 + jnp.arange(t_loc, dtype=jnp.int32))
        return jax.vmap(
            lambda p, c, k: estimate_pair(p, c, k, cfg))(prev, feats, keys)

    sharded = jax.shard_map(local, mesh=mesh,
                            in_specs=(P(axis), P()),
                            out_specs=P(axis), check_vma=False)

    def full(frames):
        base = jax.random.PRNGKey(seed)
        est = sharded(frames, base)
        est = jax.tree.map(lambda a: a[1:], est)  # drop the dummy pair
        poses = chain_relative_poses(
            est["R"], est["t"], est["have_rt"], est["pose_ok"], cfg)
        diags = {
            "num_keypoints": est["n_keypoints"],
            "num_matches": est["n_good"],
            "num_inliers": est["n_inliers"],
            "num_valid_points": est["n_valid_points"],
            "pose_ok": est["pose_ok"],
            "epipolar_residual": est["mean_residual"],
            "F": est["F"],
        }
        return poses, diags

    return jax.jit(full)


@functools.lru_cache(maxsize=None)
def _dp_sp_runner(cfg: VOConfig, mesh: Mesh,
                  data_axis: str, seq_axis: str):
    """Combined DP x SP: (B, T) sharded over ("data", "seq").

    Each device holds B/n_data sequences x T/n_seq frames. Features are
    local; the pair stage ppermutes a one-frame feature halo along
    "seq" PER LOCAL SEQUENCE (the only feature-scale transfer — there is
    no communication at all along "data"); the pose chain's doubling
    scan runs on the (B, T) est arrays under jit, where the SPMD
    partitioner inserts only 3x3-pose-scale combines along "seq".
    tests/test_parallel.py asserts this contract on the compiled HLO.
    """
    n_seq = mesh.shape[seq_axis]

    def local(frames_local, seeds_local):
        def per_seq(frames_seq, sd):
            t_loc = frames_seq.shape[0]
            feats = jax.vmap(
                lambda f: detect_and_compute(f, cfg.orb))(frames_seq)
            last = jax.tree.map(lambda a: a[-1:], feats)
            perm = [(i, i + 1) for i in range(n_seq - 1)]
            left = jax.tree.map(
                lambda a: jax.lax.ppermute(a, seq_axis, perm), last)
            prev = jax.tree.map(
                lambda l, a: jnp.concatenate([l, a[:-1]], axis=0),
                left, feats)
            base = jax.random.PRNGKey(sd)
            i0 = jax.lax.axis_index(seq_axis) * t_loc
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                i0 + jnp.arange(t_loc, dtype=jnp.int32))
            return jax.vmap(
                lambda p, c, k: estimate_pair(p, c, k, cfg))(
                prev, feats, keys)

        return jax.vmap(per_seq)(frames_local, seeds_local)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, seq_axis), P(data_axis)),
        out_specs=P(data_axis, seq_axis), check_vma=False)

    def full(frames, seeds):
        est = sharded(frames, seeds)
        est = jax.tree.map(lambda a: a[:, 1:], est)  # drop dummy pairs
        poses = jax.vmap(
            lambda R, t, h, ok: chain_relative_poses(R, t, h, ok, cfg))(
            est["R"], est["t"], est["have_rt"], est["pose_ok"])
        diags = {
            "num_keypoints": est["n_keypoints"],
            "num_matches": est["n_good"],
            "num_inliers": est["n_inliers"],
            "num_valid_points": est["n_valid_points"],
            "pose_ok": est["pose_ok"],
            "epipolar_residual": est["mean_residual"],
            "F": est["F"],
        }
        return poses, diags

    return jax.jit(full)


def run_batch_time_sharded(frames: jax.Array, cfg: VOConfig, mesh: Mesh,
                           seed: int = 0,
                           data_axis: str = "data",
                           seq_axis: str = "seq"):
    """VO over (B, T, H, W) with B sharded on `data_axis` AND T sharded
    on `seq_axis` — the full DP x SP training step the multi-chip dryrun
    compiles. Results match run_batch_of_sequences on the same frames
    (same per-sequence seeds and per-global-frame RANSAC keys); only the
    placement differs."""
    B = frames.shape[0]
    seeds = jnp.arange(B, dtype=jnp.uint32) + jnp.uint32(seed)
    fn = _dp_sp_runner(cfg, mesh, data_axis, seq_axis)
    return fn(frames, seeds)


def run_sequence_time_sharded(frames: jax.Array, cfg: VOConfig, mesh: Mesh,
                              seed: int = 0,
                              axis: str = "seq"):
    """One (T, H, W) sequence with the time axis sharded over `axis`.

    Results match run_sequence_batched on the same frames (identical
    per-global-frame RANSAC keys); only the placement differs. The only
    feature-scale communication is the explicit one-frame halo ppermute;
    the pose chain's associative scan moves 3x3s.
    """
    fn = _time_sharded_runner(cfg, mesh, seed, axis)
    return fn(frames)
