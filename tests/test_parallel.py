"""Sharded-runner tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_vo.configs import MatchConfig, ORBConfig, RansacConfig, VOConfig
from tpu_vo.parallel.mesh import make_mesh
from tpu_vo.parallel.sharding import (
    run_batch_of_sequences,
    run_sequence_time_sharded,
)
from tpu_vo.pipeline.runner import run_sequence_batched


def small_cfg(w=128, h=96):
    return VOConfig(
        image_width=w, image_height=h,
        orb=ORBConfig(n_features=64, n_levels=2, per_level_capacity=256),
        match=MatchConfig(),
        ransac=RansacConfig(max_iters=8),
    )


@pytest.fixture(scope="module")
def frames8(rng=None):
    r = np.random.default_rng(0)
    return jnp.asarray(r.integers(0, 255, size=(8, 4, 96, 128), dtype=np.uint8))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_batch_of_sequences(frames8):
    cfg = small_cfg()
    mesh = make_mesh((4, 2), ("data", "seq"))
    poses, diags = run_batch_of_sequences(frames8[:4], cfg, mesh)
    assert poses.t.shape == (4, 4, 3)
    assert diags["num_matches"].shape == (4, 3)
    # first pose of every sequence is identity
    np.testing.assert_allclose(np.asarray(poses.t)[:, 0], 0.0)


@pytest.mark.slow
def test_dp_matches_single_device(frames8):
    """Sharded run must produce the same result as unsharded vmap."""
    cfg = small_cfg()
    mesh = make_mesh((8, 1), ("data", "seq"))
    poses_sharded, _ = run_batch_of_sequences(frames8, cfg, mesh)

    seeds = jnp.arange(8, dtype=jnp.uint32)
    poses_local = jax.vmap(
        lambda s, sd: run_sequence_batched(s, cfg, seed=sd)[0]
    )(frames8, seeds)
    np.testing.assert_allclose(
        np.asarray(poses_sharded.t), np.asarray(poses_local.t), atol=1e-4
    )


def test_dp_sequences_receive_distinct_seeds(monkeypatch):
    """Each sequence in a DP batch must get its own RANSAC seed.

    Regression for the round-1 bug where _batch_runner hardcoded seed=0
    and dropped the seeds array, making every sequence in a batch draw
    identical RANSAC hypotheses. Stubs the per-sequence runner to echo the
    seed it received; fails on the old code (all sequences echo 0).
    """
    import tpu_vo.parallel.sharding as sh
    from tpu_vo.geometry.se3 import Pose

    def fake_run(seq, cfg, seed=0, frame_chunk=None, pair_chunk=None):
        T = seq.shape[0]
        t = jnp.zeros((T, 3), jnp.float32) + jnp.asarray(seed, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (T, 3, 3))
        return Pose(R, t), {}

    sh._batch_runner.cache_clear()
    monkeypatch.setattr(sh, "run_sequence_batched", fake_run)
    try:
        cfg = small_cfg()
        mesh = make_mesh((4, 2), ("data", "seq"))
        frames = jnp.zeros((4, 2, 16, 16), jnp.uint8)
        poses, _ = sh.run_batch_of_sequences(frames, cfg, mesh, seed=7)
        np.testing.assert_allclose(
            np.asarray(poses.t)[:, 0, 0], [7.0, 8.0, 9.0, 10.0]
        )
    finally:
        sh._batch_runner.cache_clear()


@pytest.mark.slow
def test_sp_time_sharded(frames8):
    """One sequence with time sharded over all 8 devices."""
    cfg = small_cfg()
    mesh = make_mesh((8,), ("seq",))
    r = np.random.default_rng(1)
    seq = jnp.asarray(r.integers(0, 255, size=(16, 96, 128), dtype=np.uint8))
    poses, diags = run_sequence_time_sharded(seq, cfg, mesh)
    assert poses.t.shape == (16, 3)

    poses_local, _ = run_sequence_batched(seq, cfg)
    np.testing.assert_allclose(
        np.asarray(poses.t), np.asarray(poses_local.t), atol=1e-4
    )


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    # trace-only check (full 8-level compile is exercised by the driver)
    jax.eval_shape(fn, *args)
