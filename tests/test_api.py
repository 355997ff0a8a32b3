"""Reference-parity object API tests (VisualOdometry / Frame / Viewer)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_vo.api import Frame, TrajectoryViewer, VisualOdometry
from tpu_vo.configs import MatchConfig, ORBConfig, RansacConfig, VOConfig
from tpu_vo.utils.synthetic import make_sequence


@pytest.fixture(scope="module")
def vo_run():
    W, H = 320, 240
    frames, _, _, _ = make_sequence(n_frames=5, width=W, height=H, seed=4)
    cfg = VOConfig(
        image_width=W, image_height=H,
        orb=ORBConfig(n_features=400, n_levels=3),
        ransac=RansacConfig(max_iters=64),
    )
    vo = VisualOdometry(W, H, config=cfg)
    overlays = []
    for i, img in enumerate(frames):
        f = Frame.from_image(i, img, timestamp=float(i))
        overlays.append(vo.process_frame(f, render_overlay=(i == 2)))
    return vo, frames, overlays


def test_camera_matrix_rule(vo_run):
    vo, _, _ = vo_run
    K = vo.camera_matrix
    assert K[0, 0] == 320 and K[0, 2] == 160 and K[1, 2] == 120


def test_trajectory_getters(vo_run):
    vo, frames, _ = vo_run
    traj = vo.get_trajectory()
    poses = vo.get_trajectory_poses()
    assert len(traj) == len(frames) == len(poses)
    np.testing.assert_allclose(traj[0], 0.0)
    np.testing.assert_allclose(np.asarray(poses[0].R), np.eye(3))


def test_last_F(vo_run):
    vo, _, _ = vo_run
    assert vo.has_last_F()
    F = vo.last_F()
    assert F.shape == (3, 3)
    assert np.isfinite(F).all()


def test_records(vo_run):
    vo, frames, _ = vo_run
    recs = vo.get_records()
    assert len(recs) == len(frames)
    assert recs[1]["matches"] > 10
    from tpu_vo.utils.records import format_reference_style

    text = format_reference_style(recs[1])
    assert "[PoseUpdate]" in text and "Position:" in text


def test_overlay_and_frame_outputs(vo_run):
    vo, frames, overlays = vo_run
    assert overlays[2] is not None
    assert overlays[2].shape == (240, 320, 3)
    assert overlays[0] is None  # only requested for frame 2


def test_checkpoint_roundtrip_api(vo_run, tmp_path):
    vo, frames, _ = vo_run
    p = str(tmp_path / "state.npz")
    vo.save_checkpoint(p)
    W, H = 320, 240
    vo2 = VisualOdometry(W, H, config=vo.config)
    vo2.restore_checkpoint(p)
    f = Frame.from_image(99, frames[-1])
    vo2.process_frame(f)  # must run from restored state without error
    assert f.processed


def test_resume_is_exact(tmp_path):
    """Straight run == run interrupted by checkpoint/restore (bitwise)."""
    W, H = 256, 192
    frames, _, _, _ = make_sequence(n_frames=4, width=W, height=H, seed=7)
    cfg = VOConfig(
        image_width=W, image_height=H,
        orb=ORBConfig(n_features=300, n_levels=2),
        ransac=RansacConfig(max_iters=32),
    )

    vo_a = VisualOdometry(W, H, config=cfg)
    for i, img in enumerate(frames):
        vo_a.process_frame(Frame.from_image(i, img))

    vo_b = VisualOdometry(W, H, config=cfg)
    for i in range(2):
        vo_b.process_frame(Frame.from_image(i, frames[i]))
    p = str(tmp_path / "mid.npz")
    vo_b.save_checkpoint(p)
    vo_c = VisualOdometry(W, H, config=cfg)
    vo_c.restore_checkpoint(p)
    for i in range(2, 4):
        vo_c.process_frame(Frame.from_image(i, frames[i]))

    tail_a = vo_a.get_trajectory()[2:]
    tail_c = vo_c.get_trajectory()
    assert len(tail_c) == 2
    for a, c in zip(tail_a, tail_c):
        np.testing.assert_array_equal(a, c)


def test_trajectory_viewer(vo_run, tmp_path):
    vo, _, _ = vo_run
    viewer = TrajectoryViewer()
    viewer.init()
    assert not viewer.should_quit()
    img = viewer.render_step(vo.get_trajectory_poses())
    assert img is not None and img.shape == (768, 1024, 3)
    ok = viewer.save_trajectory_screenshots(
        vo.get_trajectory_poses(), str(tmp_path / "shots"))
    assert ok


@pytest.mark.skipif(
    __import__("os").environ.get("TPU_VO_TEST_TPU") == "1",
    reason="the TPU leg itself generates the artifact this test checks")
def test_tpu_leg_artifact_fresh():
    """The TPU test leg's recorded artifact must exist, be green, and be
    fresh relative to the kernel sources it certifies (VERDICT r3 next
    #7). If this fails after a kernel edit, re-run
    `python tools/run_tpu_test_leg.py` on the TPU host."""
    import importlib.util
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_tpu_test_leg", os.path.join(root, "tools",
                                         "run_tpu_test_leg.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    coverage_hash = mod.coverage_hash

    path = os.path.join(root, "benchmarks", "tpu_test_log.json")
    assert os.path.exists(path), (
        "benchmarks/tpu_test_log.json missing — run "
        "tools/run_tpu_test_leg.py on the TPU host")
    with open(path) as f:
        log = json.load(f)
    assert log["returncode"] == 0 and not log["failed"], log["summary_line"]
    assert log["counts"].get("passed", 0) > 0
    assert log["kernel_coverage_hash"] == coverage_hash(), (
        "kernel sources changed since the recorded TPU test leg — "
        "re-run tools/run_tpu_test_leg.py on the TPU host")
