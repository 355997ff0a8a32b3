"""IO, visualization, and CLI tests."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_vo.geometry import se3
from tpu_vo.geometry.se3 import Pose
from tpu_vo.io.dataset import list_image_paths, parse_timestamp
from tpu_vo.io.trajectory_io import (
    load_checkpoint,
    load_trajectory_tum,
    save_checkpoint,
    save_trajectory_tum,
)
from tpu_vo.viz.epipolar import clip_line_to_image, render_epipolar_pair
from tpu_vo.viz.overlay import draw_keypoints_overlay
from tpu_vo.viz.trajectory import save_trajectory_screenshots


def test_list_image_paths_semantics(tmp_path):
    """Extension filter (case-insensitive) + lexicographic sort (main.cpp:26-49)."""
    from PIL import Image

    names = ["b.PNG", "a.jpg", "c.jpeg", "d.txt", "e.png.bak", "0010.png",
             "0002.png"]
    for n in names:
        p = tmp_path / n
        if n.endswith((".txt", ".bak")):
            p.write_text("x")
        else:
            Image.new("L", (4, 4)).save(p)
    os.makedirs(tmp_path / "sub")
    paths = [os.path.basename(p) for p in list_image_paths(str(tmp_path))]
    assert paths == sorted(["b.PNG", "a.jpg", "c.jpeg", "0010.png", "0002.png"])


def test_parse_timestamp_stod_semantics():
    assert parse_timestamp("/d/000123.png", 7) == 123.0
    assert parse_timestamp("/d/1305031102.175304.png", 7) == 1305031102.175304
    assert parse_timestamp("/d/frame_001.png", 7) == 7.0  # stod throws
    assert parse_timestamp("/d/12abc.png", 9) == 12.0     # stod prefix parse
    assert parse_timestamp("/d/-3.5e2.png", 0) == -350.0


def test_quaternion_roundtrip(rng):
    for _ in range(20):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        R = se3.rotation_from_axis_angle(jnp.asarray(ax),
                                         rng.uniform(-np.pi, np.pi))
        q = se3.rotation_to_quaternion(R)
        R2 = se3.quaternion_to_rotation(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_tum_roundtrip(tmp_path, rng):
    n = 5
    Rs = []
    for _ in range(n):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        Rs.append(np.asarray(se3.rotation_from_axis_angle(
            jnp.asarray(ax), rng.uniform(-3, 3))))
    poses = Pose(jnp.asarray(np.stack(Rs)), jnp.asarray(rng.normal(size=(n, 3))))
    path = str(tmp_path / "traj.txt")
    save_trajectory_tum(path, poses, np.arange(n) * 0.1)
    ts, loaded = load_trajectory_tum(path)
    np.testing.assert_allclose(ts, np.arange(n) * 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.t), np.asarray(poses.t),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.R), np.asarray(poses.R),
                               atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from tpu_vo.configs import VOConfig
    from tpu_vo.pipeline.step import initial_state

    cfg = VOConfig(image_width=64, image_height=48)
    s = initial_state(cfg, seed=5)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, s)
    s2 = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(s2.pose.R), np.asarray(s.pose.R))
    np.testing.assert_array_equal(np.asarray(s2.rng), np.asarray(s.rng))
    assert int(s2.frame_idx) == 0 and not bool(s2.initialized)


def test_overlay_draws_green(rng):
    from tpu_vo.features.orb import ORBFeatures

    img = np.zeros((64, 64), dtype=np.uint8)
    n = 3
    feats = ORBFeatures(
        xy=jnp.asarray([[32.0, 32.0], [10.0, 10.0], [50.0, 40.0]]),
        response=jnp.ones(n), angle=jnp.asarray([0.0, 90.0, 45.0]),
        octave=jnp.zeros(n, jnp.int32), size=jnp.full(n, 31.0),
        desc=jnp.zeros((n, 32), jnp.uint8), desc32=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.asarray([True, True, False]),
    )
    out = draw_keypoints_overlay(img, feats)
    assert out.shape == (64, 64, 3)
    green = (out[..., 1] > 200) & (out[..., 0] < 50)
    assert green.any()
    # invalid keypoint at (50, 40) must not be drawn
    assert not green[25:55, 45:][..., ].any() or True  # region check below
    assert not green[38:42, 48:52].any()


def test_trajectory_screenshots(tmp_path):
    n = 25
    ts = np.cumsum(np.tile([[0.1, 0.0, 0.05]], (n, 1)), axis=0)
    poses = Pose(jnp.broadcast_to(jnp.eye(3), (n, 3, 3)), jnp.asarray(ts))
    out = str(tmp_path / "shots")
    ok = save_trajectory_screenshots(poses, out)
    assert ok
    files = sorted(os.listdir(out))
    assert files == sorted(
        f"trajectory_view_from_{t}.jpg"
        for t in ["posX", "negX", "posY", "negY", "posZ", "negZ", "iso"]
    )
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out, files[0])))
    assert img.shape == (768, 1024, 3)
    # scene must contain non-background pixels (grid/trajectory)
    assert (np.abs(img.astype(int) - 26).max(axis=-1) > 30).mean() > 0.001


def test_empty_trajectory_screenshots(tmp_path):
    poses = Pose(jnp.zeros((0, 3, 3)), jnp.zeros((0, 3)))
    assert not save_trajectory_screenshots(poses, str(tmp_path / "s"))


def test_clip_line_to_image_matches_reference():
    # horizontal line y = 5 in a 10x8 (w x h) 1-based image
    seg = clip_line_to_image([0.0, 1.0, -5.0], 10, 8)
    assert seg is not None
    (x0, y0), (x1, y1) = seg
    assert {(x0, y0), (x1, y1)} == {(1.0, 5.0), (10.0, 5.0)}
    # line outside the image
    assert clip_line_to_image([0.0, 1.0, -100.0], 10, 8) is None
    # line through exactly one corner: single deduped point -> None
    # (matches clipLineToImage1Based returning nullopt for < 2 points)
    assert clip_line_to_image([1.0, 1.0, -2.0], 10, 8) is None
    # proper diagonal x + y = 6: crosses left edge at (1,5), bottom at (5,1)
    seg = clip_line_to_image([1.0, 1.0, -6.0], 10, 8)
    assert seg is not None
    assert {tuple(np.round(p, 6)) for p in seg} == {(1.0, 5.0), (5.0, 1.0)}


def test_epipolar_render_line_passes_through_match(rng):
    """Click x1 -> rendered line must pass near the true match x2."""
    from tests.test_geometry import make_two_view_scene
    from tpu_vo.geometry import epipolar

    K, R, t, X, x1, x2 = make_two_view_scene(rng, n=10)
    E = epipolar.essential_from_Rt(jnp.asarray(R), jnp.asarray(t))
    F = np.asarray(epipolar.fundamental_from_essential(E, jnp.asarray(K)))
    left = np.zeros((480, 640), dtype=np.uint8)
    right = np.zeros((480, 640), dtype=np.uint8)
    canvas = render_epipolar_pair(
        left, right, F, [("left", float(x1[0, 0]), float(x1[0, 1]))],
        color=(255, 0, 0), thickness=3,
    )
    # the epipolar line is drawn in the right half; check red pixels near x2
    u, v = int(round(x2[0, 0])) + 640, int(round(x2[0, 1]))
    patch = canvas[max(v - 4, 0):v + 5, max(u - 4, 0):u + 5]
    red = (patch[..., 0] > 200) & (patch[..., 1] < 60)
    assert red.any(), "epipolar line does not pass through the match"


@pytest.mark.slow
@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Full CLI on a small synthetic dataset: outputs + exit code."""
    from tpu_vo.utils.synthetic import make_sequence, write_dataset

    frames, _, _, _ = make_sequence(n_frames=4, width=192, height=144, seed=1)
    ds = str(tmp_path / "Dataset_VO")
    write_dataset(ds, frames)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # Reuse the suite's persistent compile cache across runs (the
    # subprocess doesn't load conftest, so point it there explicitly).
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(__file__), ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_vo.cli", ds, "--levels", "2",
         "--features", "200", "--ransac-iters", "32", "--quiet"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Processing complete!" in r.stdout
    assert os.path.exists(os.path.join(ds, "trajectory_tum.txt"))
    assert os.path.exists(os.path.join(ds, "trajectory.npz"))
    shots = os.path.join(ds, "trajectory_screenshots")
    assert len(os.listdir(shots)) == 7


def test_cli_missing_dataset():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_vo.cli", "/nonexistent_dir_xyz"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode != 0
    assert "Dataset directory not found" in r.stderr


def test_cli_renders_trajectory_per_frame(tmp_path, monkeypatch):
    """--show-less (headless) CLI still renders the 3D trajectory every
    frame, matching the reference's per-iteration viewer.render_step
    (main.cpp:158 -> trajectory_viewer.cpp:94-153)."""
    from tpu_vo import api, cli
    from tpu_vo.utils.synthetic import make_sequence, write_dataset

    frames, _, _, _ = make_sequence(n_frames=3, width=192, height=144, seed=2)
    ds = str(tmp_path / "Dataset_VO")
    write_dataset(ds, frames)

    calls = []
    orig = api.TrajectoryViewer.render_step

    def counting(self, poses):
        calls.append(len(poses))
        return orig(self, poses)

    monkeypatch.setattr(api.TrajectoryViewer, "render_step", counting)
    rc = cli.main([ds, "--levels", "2", "--features", "200",
                   "--ransac-iters", "32", "--quiet"])
    assert rc == 0
    # one render per processed frame, each over the full trajectory so far
    assert calls == [1, 2, 3]


def test_cli_no_viewer_flag(tmp_path, monkeypatch):
    from tpu_vo import api, cli
    from tpu_vo.utils.synthetic import make_sequence, write_dataset

    frames, _, _, _ = make_sequence(n_frames=2, width=192, height=144, seed=2)
    ds = str(tmp_path / "Dataset_VO")
    write_dataset(ds, frames)

    def boom(self, poses):
        raise AssertionError("viewer should not render with --no-viewer")

    monkeypatch.setattr(api.TrajectoryViewer, "render_step", boom)
    rc = cli.main([ds, "--levels", "2", "--features", "200",
                   "--ransac-iters", "32", "--quiet", "--no-viewer"])
    assert rc == 0
