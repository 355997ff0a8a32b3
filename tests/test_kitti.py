"""KITTI odometry layout ingestion (io/kitti.py).

The reference only reads a flat image directory and guesses intrinsics
from image size (main.cpp:26-49, visual_odometry.cpp:90-98); real
deployments consume the KITTI odometry tree. These tests build a synthetic
sequences/<NN> tree (images + calib.txt + times.txt + poses/<NN>.txt) and
check detection, calibration parsing, pose-file round-trips, the CLI's
end-to-end KITTI path, and format auto-detection in the evaluator.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tpu_vo.io import kitti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_kitti_tree(root, n_frames=3, width=192, height=144, camera=0,
                      fx=180.0, fy=178.5, cx=95.0, cy=71.25):
    """Build dataset_root/{sequences/00, poses/00.txt} with synthetic
    frames and a calibrated projection matrix."""
    from tpu_vo.utils.synthetic import make_sequence

    seq_dir = os.path.join(root, "sequences", "00")
    img_dir = os.path.join(seq_dir, f"image_{camera}")
    os.makedirs(img_dir, exist_ok=True)
    frames, Rs, ts, _ = make_sequence(n_frames=n_frames, width=width,
                                      height=height, seed=3)
    from PIL import Image

    for i, fr in enumerate(frames):
        Image.fromarray(np.asarray(fr)).save(
            os.path.join(img_dir, f"{i:06d}.png"))

    # calib.txt: P0..P3 share K here; P1/P3 carry a stereo baseline term
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        for ci in range(4):
            P = np.hstack([K, np.array([[-386.1 * (ci % 2)], [0.0], [0.0]])])
            f.write(f"P{ci}: " + " ".join(f"{v:.12e}" for v in P.ravel())
                    + "\n")
        f.write("Tr: " + " ".join(["0"] * 12) + "\n")

    times = 0.1 * np.arange(n_frames)
    np.savetxt(os.path.join(seq_dir, "times.txt"), times, fmt="%.6f")

    # ground-truth poses: T_wc rows from the generator's camera poses
    pose_dir = os.path.join(root, "poses")
    os.makedirs(pose_dir, exist_ok=True)
    T = np.concatenate([np.asarray(Rs, np.float64),
                        np.asarray(ts, np.float64)[..., None]], axis=-1)
    np.savetxt(os.path.join(pose_dir, "00.txt"),
               T.reshape(n_frames, 12), fmt="%.9e")
    return seq_dir, (fx, fy, cx, cy), times


def test_detect_and_open(tmp_path):
    seq_dir, intr, times = _write_kitti_tree(str(tmp_path))
    assert kitti.is_kitti_sequence(seq_dir)
    assert not kitti.is_kitti_sequence(str(tmp_path))

    seq = kitti.open_kitti_sequence(seq_dir)
    assert seq.camera == 0
    assert len(seq.image_paths) == 3
    assert seq.intrinsics == pytest.approx(intr)
    assert np.allclose(seq.times, times)
    assert seq.gt_poses_path and seq.gt_poses_path.endswith(
        os.path.join("poses", "00.txt"))


def test_open_explicit_camera_and_missing(tmp_path):
    seq_dir, _, _ = _write_kitti_tree(str(tmp_path), camera=2)
    seq = kitti.open_kitti_sequence(seq_dir)      # preference falls to 2
    assert seq.camera == 2
    with pytest.raises(ValueError):
        kitti.open_kitti_sequence(seq_dir, camera=1)


def test_calib_parse_and_projection_intrinsics(tmp_path):
    seq_dir, (fx, fy, cx, cy), _ = _write_kitti_tree(str(tmp_path))
    calib = kitti.parse_calib(os.path.join(seq_dir, "calib.txt"))
    assert set(calib) == {"P0", "P1", "P2", "P3", "Tr"}
    assert calib["P1"].shape == (3, 4)
    got = kitti.intrinsics_from_projection(calib["P0"])
    assert got == pytest.approx((fx, fy, cx, cy))
    # the baseline column of P1 must not perturb intrinsics
    assert kitti.intrinsics_from_projection(calib["P1"]) == pytest.approx(got)


def test_pose_file_roundtrip(tmp_path):
    from tpu_vo.geometry.se3 import Pose
    from tpu_vo.io.trajectory_io import (load_trajectory_kitti,
                                         save_trajectory_kitti)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 5
    # random valid rotations via QR
    Rs = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Rs.append(q)
    Rs = np.stack(Rs)
    ts = rng.normal(size=(n, 3))
    path = str(tmp_path / "est_kitti.txt")
    save_trajectory_kitti(path, Pose(jnp.asarray(Rs), jnp.asarray(ts)))
    back = load_trajectory_kitti(path)
    np.testing.assert_allclose(np.asarray(back.R), Rs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.t), ts, atol=1e-6)
    # the file is also a valid KITTI GT file for the raw loader
    R2, t2 = kitti.load_kitti_poses(path)
    np.testing.assert_allclose(R2, Rs, atol=1e-9)


def test_intrinsics_override_changes_K():
    from tpu_vo.configs import VOConfig

    guess = VOConfig(image_width=192, image_height=144)
    assert guess.intrinsics == (192.0, 192.0, 96.0, 72.0)
    cal = VOConfig(image_width=192, image_height=144,
                   intrinsics_override=(180.0, 178.5, 95.0, 71.25))
    assert cal.intrinsics == (180.0, 178.5, 95.0, 71.25)
    assert hash(cal) != hash(guess)   # static jit arg must distinguish them


def test_cli_kitti_end_to_end(tmp_path, capsys):
    """CLI autodetects the KITTI layout: calibrated K, times.txt stamps,
    GT discovery + ATE report, and KITTI-format trajectory output."""
    from tpu_vo import cli

    seq_dir, (fx, fy, cx, cy), _ = _write_kitti_tree(str(tmp_path))
    out_dir = str(tmp_path / "out")
    rc = cli.main([seq_dir, "--levels", "2", "--features", "200",
                   "--ransac-iters", "32", "--quiet", "--no-viewer",
                   "--out-dir", out_dir])
    assert rc == 0
    text = capsys.readouterr().out
    assert "KITTI odometry sequence detected (camera 0" in text
    assert "(calibrated)" in text
    assert f"{fy}" in text  # calibrated fy (178.5) printed in K
    assert "Ground-truth evaluation" in text
    assert "ate_rmse=" in text

    est_path = os.path.join(out_dir, "trajectory_kitti.txt")
    assert os.path.isfile(est_path)
    R, t = kitti.load_kitti_poses(est_path)
    assert R.shape == (3, 3, 3) and t.shape == (3, 3)

    # TUM stamps come from times.txt, not filename stems
    with open(os.path.join(out_dir, "trajectory_tum.txt")) as f:
        stamps = [float(l.split()[0]) for l in f if not l.startswith("#")]
    assert stamps == pytest.approx([0.0, 0.1, 0.2])


def test_evaluator_accepts_kitti_format(tmp_path):
    """tools/evaluate_trajectory.py auto-detects KITTI vs TUM per file."""
    from tpu_vo.geometry.se3 import Pose
    from tpu_vo.io.trajectory_io import (save_trajectory_kitti,
                                         save_trajectory_tum)
    import jax.numpy as jnp

    n = 6
    ts = np.cumsum(np.ones((n, 3)) * [0.1, 0.0, 0.02], axis=0)
    Rs = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()
    pose = Pose(jnp.asarray(Rs), jnp.asarray(ts))
    kitti_file = str(tmp_path / "gt.txt")
    tum_file = str(tmp_path / "est.txt")
    save_trajectory_kitti(kitti_file, pose)
    save_trajectory_tum(tum_file, pose)

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # sitecustomize registers the remote-TPU backend before JAX_PLATFORMS
    # applies; if the chip is busy the subprocess blocks on the tunnel
    # (observed: a 778 s run of this 1-second test). Unset the pool var
    # so the child never touches the TPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/evaluate_trajectory.py"),
         tum_file, kitti_file, "--align", "none"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr
    import json

    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ate_rmse"] == pytest.approx(0.0, abs=1e-6)
    assert out["frames"] == n
