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
    # f32 (the production dtype): these compare two of our
    # own f32 paths, not float64 goldens — and run ~2x
    # faster on the x64-defaulting CPU suite.
    with jax.enable_x64(False):
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
    """Each sequence in a DP batch must get its own RANSAC key stream.

    Regression for the round-1 bug where _batch_runner hardcoded seed=0
    and dropped the seeds array, making every sequence in a batch draw
    identical RANSAC hypotheses. Stubs estimate_pair (bound by the
    flattened runner at build time) to echo the key it received; the
    echoed keys must equal fold_in(PRNGKey(seed + b), frame_idx) — the
    exact per-sequence scheme of run_sequence_batched.
    """
    import tpu_vo.parallel.sharding as sh
    import tpu_vo.pipeline.step as step_mod

    def _key_bits(key):
        raw = (jax.random.key_data(key)
               if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
        # mod in integer space BEFORE the float cast (2^16 is f32-exact)
        return (raw % 65536).astype(jnp.float32)

    def fake_estimate_pair(prev, cur, key, cfg):
        kd = _key_bits(key)
        z = jnp.float32(0.0)
        return dict(
            R=jnp.eye(3, dtype=jnp.float32),
            # echo the RANSAC key through the translation slot
            t=jnp.stack([kd[0], kd[1], z]),
            have_rt=jnp.asarray(True),
            pose_ok=jnp.asarray(True),
            n_keypoints=jnp.int32(0), n_good=jnp.int32(0),
            n_inliers=jnp.int32(0), n_valid_points=jnp.int32(0),
            mean_residual=z, F=jnp.zeros((3, 3), jnp.float32),
        )

    sh._batch_runner.cache_clear()
    monkeypatch.setattr(step_mod, "estimate_pair", fake_estimate_pair)
    try:
        cfg = small_cfg()
        mesh = make_mesh((4, 2), ("data", "seq"))
        frames = jnp.zeros((4, 3, 16, 16), jnp.uint8)
        poses, _ = sh.run_batch_of_sequences(frames, cfg, mesh, seed=7)
        # pose after pair (b, i=1): t = -scale * t_echo (R = I inverts to
        # t_inv = -t; chain scales by trajectory_scale)
        got = -np.asarray(poses.t)[:, 1, :2] / cfg.trajectory_scale
        for b in range(4):
            kd = np.asarray(_key_bits(
                jax.random.fold_in(jax.random.PRNGKey(7 + b), 1)))
            np.testing.assert_allclose(got[b], kd, atol=1e-2)
    finally:
        sh._batch_runner.cache_clear()


@pytest.mark.slow
def test_sp_time_sharded(frames8):
    """One sequence with time sharded over all 8 devices."""
    # f32 (the production dtype): these compare two of our
    # own f32 paths, not float64 goldens — and run ~2x
    # faster on the x64-defaulting CPU suite.
    with jax.enable_x64(False):
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


def _collective_ops(compiled_text):
    """(op_name, element_count) for every collective in optimized HLO."""
    import re

    pat = re.compile(
        r"= \w+\[([\d,]*)\][^ ]* "
        r"(all-gather|all-reduce|collective-permute|all-to-all|"
        r"reduce-scatter)\(")
    out = []
    for line in compiled_text.splitlines():
        m = pat.search(line)
        if m:
            dims = [int(d) for d in m.group(1).split(",") if d]
            n = 1
            for d in dims:
                n *= d
            out.append((m.group(2), n))
    return out


@pytest.mark.slow
def test_dp_compiles_to_zero_collectives(frames8):
    """The DP claim ("zero collectives, scales linearly") held at the HLO
    level: shard_map guarantees no communication; this fails if a future
    refactor reintroduces jit-partitioned ops XLA must all-gather for
    (the old NamedSharding formulation gathered full FAST score maps
    across devices to satisfy top_k)."""
    import tpu_vo.parallel.sharding as sh

    cfg = small_cfg()
    mesh = make_mesh((8, 1), ("data", "seq"))
    seeds = jnp.arange(8, dtype=jnp.uint32)
    fn = sh._batch_runner(cfg, mesh, None, None)
    txt = fn.lower(frames8, seeds).compile().as_text()
    colls = _collective_ops(txt)
    assert colls == [], f"DP path must be communication-free, found {colls}"


@pytest.mark.slow
def test_sp_collectives_are_small():
    """SP moves only the one-frame feature halo (ppermute) and the pose
    chain's 3x3 combines — never frames or score maps. Every collective
    in the compiled program must be below image scale, and the halo
    ppermute must exist."""
    import tpu_vo.parallel.sharding as sh

    cfg = small_cfg()
    mesh = make_mesh((8,), ("seq",))
    fn = sh._time_sharded_runner(cfg, mesh, 0, "seq")
    frames = jnp.zeros((16, 96, 128), jnp.uint8)
    txt = fn.lower(frames).compile().as_text()
    colls = _collective_ops(txt)
    pixels = 96 * 128
    big = [c for c in colls if c[1] >= pixels]
    assert not big, f"image-scale collective(s) in SP program: {big}"
    assert any(op == "collective-permute" for op, _ in colls), \
        "expected the one-frame feature halo ppermute"


def test_dp_sp_combined_matches_batched(frames8):
    """Combined DP x SP runner (batch on "data", time on "seq" with the
    one-frame halo) must reproduce the per-sequence batched runner."""
    # f32 (the production dtype): these compare two of our
    # own f32 paths, not float64 goldens — and run ~2x
    # faster on the x64-defaulting CPU suite.
    with jax.enable_x64(False):
        from tpu_vo.parallel.sharding import run_batch_time_sharded

        cfg = small_cfg()
        mesh = make_mesh((4, 2), ("data", "seq"))
        poses, diags = run_batch_time_sharded(frames8[:4], cfg, mesh)
        assert poses.t.shape == (4, 4, 3)

        seeds = jnp.arange(4, dtype=jnp.uint32)
        poses_local = jax.vmap(
            lambda s, sd: run_sequence_batched(s, cfg, seed=sd)[0]
        )(frames8[:4], seeds)
        np.testing.assert_allclose(
            np.asarray(poses.t), np.asarray(poses_local.t), atol=1e-4
        )


@pytest.mark.slow
def test_dp_sp_collective_contract(frames8):
    """HLO contract on the combined DP x SP 4x2 mesh (VERDICT r3 next
    #10): no image-scale collectives anywhere (nothing at all moves
    along "data"; "seq" moves only the one-frame feature halo and the
    pose scan's 3x3 combines), and the halo ppermute must exist."""
    from tpu_vo.parallel import sharding as sh

    cfg = small_cfg()
    mesh = make_mesh((4, 2), ("data", "seq"))
    fn = sh._dp_sp_runner(cfg, mesh, "data", "seq")
    seeds = jnp.arange(4, dtype=jnp.uint32)
    txt = fn.lower(frames8[:4], seeds).compile().as_text()
    colls = _collective_ops(txt)
    pixels = 96 * 128
    big = [c for c in colls if c[1] >= pixels]
    assert not big, f"image-scale collective(s) in DPxSP program: {big}"
    assert any(op == "collective-permute" for op, _ in colls), \
        "expected the one-frame feature halo ppermute"
