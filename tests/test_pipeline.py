"""End-to-end pipeline tests: vo_step semantics, runners, trajectory parity.

The parity bar: on a well-conditioned synthetic scene, our trajectory must
track the cv2-based reference re-implementation (tpu_vo/utils/cv_reference,
a faithful port of visual_odometry.cpp) and the ground-truth rotations at
least as well as the reference tracks them. Monocular translation is only
a direction (fixed 0.3 scale), so ATE is compared relative to trajectory
extent.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig, RansacConfig, VOConfig
from tpu_vo.pipeline.runner import (
    chain_relative_poses,
    run_sequence_batched,
    run_sequence_scan,
)
from tpu_vo.pipeline.step import initial_state, vo_step
from tpu_vo.utils.cv_reference import (
    ReferenceVO,
    absolute_trajectory_error,
    relative_pose_error,
)
from tpu_vo.utils.synthetic import make_sequence
from tpu_vo.geometry import se3
from tpu_vo.geometry.se3 import Pose

# 480x360 keeps the cv2 reference itself well-conditioned (at smaller
# resolutions its recoverPose cheirality gate fails and the golden
# trajectory degenerates); T stays small since compile cost dominates.
W, H, T = 480, 360, 8


@pytest.fixture(scope="module")
def scene():
    frames, Rs, ts, K = make_sequence(n_frames=T, width=W, height=H, seed=3)
    return frames, Rs, ts, K


@pytest.fixture(scope="module")
def cfg():
    return VOConfig(image_width=W, image_height=H)


@pytest.fixture(scope="module")
def scan_outputs(scene, cfg):
    frames = jnp.asarray(np.stack(scene[0]))
    return jax.jit(lambda f: run_sequence_scan(f, cfg))(frames)


def test_first_frame_is_identity(scan_outputs):
    np.testing.assert_allclose(np.asarray(scan_outputs.pose.R[0]), np.eye(3))
    np.testing.assert_allclose(np.asarray(scan_outputs.pose.t[0]), 0.0)
    assert int(scan_outputs.num_matches[0]) == 0
    assert not bool(scan_outputs.pose_ok[0])


def test_step_outputs_reasonable(scan_outputs):
    m = np.asarray(scan_outputs.num_matches[1:])
    assert (m > 50).all(), m
    ok = np.asarray(scan_outputs.pose_ok[1:])
    assert ok.mean() > 0.7, ok
    res = np.asarray(scan_outputs.epipolar_residual[1:])
    assert (res[ok] < 3.0).all(), res  # reference expectation: ~1-3 px


def test_trajectory_tracks_reference_and_gt(scene, cfg, scan_outputs):
    frames, Rs_gt, ts_gt, _ = scene
    ref = ReferenceVO(W, H)
    traj_ref = ref.run(frames)
    Rs_ref = [r for r, _ in ref.trajectory]

    traj_ours = np.asarray(scan_outputs.pose.t)
    extent = max(np.linalg.norm(traj_ref[-1]), 1e-9)
    ate = absolute_trajectory_error(traj_ours, traj_ref)
    # Both pipelines estimate the same motion with ~5-10 deg per-pair
    # translation-direction noise at this resolution (cv2 included — see
    # test_estimation's head-to-head), and chaining amplifies early-frame
    # direction differences; the rotation assertion below is the tight
    # parity check.
    assert ate / extent < 0.3, f"ATE {ate} vs extent {extent}"

    rot_ours = relative_pose_error(np.asarray(scan_outputs.pose.R), Rs_gt)
    rot_ref = relative_pose_error(Rs_ref, Rs_gt)
    assert rot_ours < rot_ref + 1.0, (rot_ours, rot_ref)


@pytest.mark.slow
def test_batched_runner_agrees_with_scan(scene, cfg, scan_outputs):
    """The deterministic stages (features, matching) must agree exactly;
    the RANSAC stage is statistically equivalent but not bitwise (vmap
    reassociates float reductions, and near-degenerate pairs amplify
    that), so pose agreement is asserted with estimator-noise tolerance.
    """
    frames = jnp.asarray(np.stack(scene[0]))
    poses, diags = jax.jit(lambda f: run_sequence_batched(f, cfg))(frames)

    np.testing.assert_array_equal(
        np.asarray(diags["num_matches"]),
        np.asarray(scan_outputs.num_matches[1:]),
    )
    ok_b = np.asarray(diags["pose_ok"])
    ok_s = np.asarray(scan_outputs.pose_ok[1:])
    assert (ok_b == ok_s).mean() >= 0.8, (ok_b, ok_s)

    # Cumulative rotation agreement within estimator noise
    rot_diff = relative_pose_error(
        np.asarray(poses.R), list(np.asarray(scan_outputs.pose.R))
    )
    assert rot_diff < 2.0, f"runner rotation divergence {rot_diff} deg"

    traj_b = np.asarray(poses.t)
    traj_s = np.asarray(scan_outputs.pose.t)
    extent = max(np.linalg.norm(traj_s[-1]), 1e-9)
    ate = absolute_trajectory_error(traj_b, traj_s)
    assert ate / extent < 0.3, f"batched vs scan ATE {ate} (extent {extent})"


@pytest.fixture(scope="module")
def tiny_scene():
    """Chunking-mechanics tests don't need the well-conditioned 480x360
    scene (that resolution exists for cv2-reference parity) nor the full
    8-level frontend: XLA compile time scales with graph size, so a
    2-level config compiles ~4x faster on the 1-core CPU host. The
    assertions below compare two runner paths on identical inputs, not
    accuracy vs ground truth. The corridor generator (strong parallax)
    keeps RANSAC winners stable so reduction-order noise between the
    chunked/streamed/batched formulations can't flip near-tied
    hypotheses."""
    from tpu_vo.utils.synthetic import make_corridor_sequence

    frames, _, _, _ = make_corridor_sequence(n_frames=8, width=160,
                                             height=120, seed=3)
    cfg = VOConfig(
        image_width=160, image_height=120,
        orb=ORBConfig(n_features=128, n_levels=2, per_level_capacity=512),
        ransac=RansacConfig(max_iters=32),
    )
    return np.stack(frames), cfg


def test_chunk_validation_guards(tiny_scene, monkeypatch):
    """Known-faulting tilings must raise a clear error instead of letting
    the user crash the TPU runtime (docs/KNOWN_ISSUES.md #1)."""
    from tpu_vo.pipeline import runner

    frames_np, cfg_t = tiny_scene
    frames = jnp.asarray(frames_np)

    with pytest.raises(ValueError, match="positive"):
        run_sequence_batched(frames, cfg_t, pair_chunk=0)

    # Simulate a TPU backend: the pc=21 guard only fires off-CPU.
    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(runner.jax, "devices", lambda *a: [_Dev()])
    monkeypatch.delenv("TPU_VO_ALLOW_FAULTING_TILINGS", raising=False)
    with pytest.raises(ValueError, match="KNOWN_ISSUES"):
        runner._validate_chunks(None, 21)
    # escape hatch for re-probing after platform updates
    monkeypatch.setenv("TPU_VO_ALLOW_FAULTING_TILINGS", "1")
    runner._validate_chunks(None, 21)


@pytest.mark.slow
def test_batched_runner_chunked(tiny_scene):
    frames_np, cfg_t = tiny_scene
    frames = jnp.asarray(frames_np)
    a, _ = run_sequence_batched(frames, cfg_t, frame_chunk=4, pair_chunk=7)
    b, _ = run_sequence_batched(frames, cfg_t)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-4)


def test_chain_relative_poses_matches_serial(rng):
    P = 6
    Rs, ts = [], []
    for _ in range(P):
        ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
        Rs.append(np.asarray(se3.rotation_from_axis_angle(
            jnp.asarray(ax, dtype=jnp.float32), rng.uniform(0.01, 0.2))))
        ts.append(rng.normal(size=3).astype(np.float32))
    R = jnp.asarray(np.stack(Rs)); t = jnp.asarray(np.stack(ts))
    have = jnp.asarray([True, True, False, True, True, True])
    ok = jnp.asarray([True, False, False, True, True, False])
    cfg = VOConfig()
    chained = chain_relative_poses(R, t, have, ok, cfg)

    # serial replay of the reference composition
    pose = Pose.identity(dtype=jnp.float32)
    expect = [np.zeros(3)]
    for i in range(P):
        if bool(have[i]):
            s = 0.3 if bool(ok[i]) else 0.0
            Ri, ti = se3.invert_relative(R[i], t[i])
            pose = se3.compose_next_pose(pose, Ri, ti, s)
        expect.append(np.asarray(pose.t))
    np.testing.assert_allclose(np.asarray(chained.t), np.stack(expect),
                               atol=1e-4)


def test_failure_ladder_blank_frames(cfg):
    """Blank frames: no features -> pose held at identity, no crash."""
    frames = jnp.zeros((4, H, W), dtype=jnp.float32)
    outs = run_sequence_scan(frames, cfg)
    np.testing.assert_allclose(np.asarray(outs.pose.t), 0.0)
    assert not np.asarray(outs.pose_ok).any()
    assert (np.asarray(outs.num_matches) == 0).all()


def test_failure_ladder_static_then_moving(scene, cfg):
    """Repeated identical frame: motion must stay ~zero (R ~ I, t frozen)."""
    f = jnp.asarray(scene[0][0])
    frames = jnp.stack([f, f, f])
    outs = run_sequence_scan(frames, cfg)
    # identical frames: essentially zero motion; translation scaled by 0.3
    # in a random direction only if pose_ok — degenerate E on zero baseline
    # should either fail gates (held pose) or give tiny rotation.
    R_last = np.asarray(outs.pose.R[-1])
    ang = np.degrees(np.arccos(np.clip((np.trace(R_last) - 1) / 2, -1, 1)))
    assert ang < 2.0, f"static scene produced {ang} deg rotation"


def test_vo_step_jit_stability(tiny_scene):
    """Two jitted invocations with the same state are deterministic.
    Determinism is config-size-independent, so this runs on the tiny
    2-level fixture (the 480x360 8-level variant added a full extra
    compile for identical coverage — VERDICT r3 next #8)."""
    import functools

    frames_np, cfg_t = tiny_scene
    step = jax.jit(functools.partial(vo_step, cfg=cfg_t))
    s0 = initial_state(cfg_t)
    s1, _ = step(s0, jnp.asarray(frames_np[0]))
    a, outa = step(s1, jnp.asarray(frames_np[1]))
    b, outb = step(s1, jnp.asarray(frames_np[1]))
    np.testing.assert_array_equal(np.asarray(outa.pose.t), np.asarray(outb.pose.t))


@pytest.mark.slow
def test_streamed_runner_matches_batched(tiny_scene):
    """run_sequence_streamed over chunks == run_sequence_batched on the
    concatenated frames (same per-global-frame RANSAC keys -> identical
    sampling; only the chunking differs)."""
    from tpu_vo.pipeline.runner import run_sequence_streamed

    frames_np, cfg_t = tiny_scene
    frames = frames_np[:8]
    poses_b, diags_b = jax.jit(
        lambda f: run_sequence_batched(f, cfg_t))(jnp.asarray(frames))

    chunks = [frames[:4], frames[4:]]
    poses_s, diags_s = run_sequence_streamed(iter(chunks), cfg_t, 4)

    np.testing.assert_array_equal(
        np.asarray(diags_s["num_matches"]), np.asarray(diags_b["num_matches"]))
    traj_b = np.asarray(poses_b.t)
    traj_s = np.asarray(poses_s.t)
    extent = max(np.linalg.norm(traj_b[-1]), 1e-9)
    ate = absolute_trajectory_error(traj_s, traj_b)
    assert ate / extent < 0.05, f"streamed vs batched ATE {ate}"


@pytest.mark.nightly
def test_full_config_chunked_and_streamed_runners(scene, cfg, scan_outputs):
    """ADVICE r3: the chunked and streamed runner paths exercised with
    the DEFAULT 8-level full-resolution config, not just the tiny
    2-level fixture — a level-count- or resolution-dependent chunking
    bug would otherwise go undetected. Nightly-marked (full-pipeline CPU
    compiles; deselected from the default suite, run by the TPU leg and
    `-m nightly`)."""
    from tpu_vo.pipeline.runner import run_sequence_streamed

    frames_np = np.stack(scene[0])
    frames = jnp.asarray(frames_np)
    poses_c, diags_c = run_sequence_batched(frames, cfg, frame_chunk=4,
                                            pair_chunk=7)
    np.testing.assert_array_equal(
        np.asarray(diags_c["num_matches"]),
        np.asarray(scan_outputs.num_matches[1:]))
    traj_c = np.asarray(poses_c.t)
    traj_s = np.asarray(scan_outputs.pose.t)
    ext = max(np.linalg.norm(traj_s[-1]), 1e-9)
    assert absolute_trajectory_error(traj_c, traj_s) / ext < 0.3

    chunks = [frames_np[:4], frames_np[4:]]
    poses_st, diags_st = run_sequence_streamed(iter(chunks), cfg, 4)
    np.testing.assert_array_equal(
        np.asarray(diags_st["num_matches"]),
        np.asarray(scan_outputs.num_matches[1:]))
    assert absolute_trajectory_error(
        np.asarray(poses_st.t), traj_s) / ext < 0.3
