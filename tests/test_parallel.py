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


def test_dp_matches_single_device(frames8):
    """Sharded run must produce the same result as unsharded vmap."""
    cfg = small_cfg()
    mesh = make_mesh((8, 1), ("data", "seq"))
    poses_sharded, _ = run_batch_of_sequences(frames8, cfg, mesh)

    poses_local = jax.vmap(
        lambda s: run_sequence_batched(s, cfg)[0]
    )(frames8)
    np.testing.assert_allclose(
        np.asarray(poses_sharded.t), np.asarray(poses_local.t), atol=1e-4
    )


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
