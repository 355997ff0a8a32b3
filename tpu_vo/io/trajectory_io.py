"""Trajectory persistence and checkpoint/resume.

The reference persists nothing but screenshots (SURVEY.md §5
"checkpoint/resume: absent"); we add proper artifacts:
  - TUM-format text (timestamp tx ty tz qx qy qz qw) for evaluation tools,
  - npz with full (R, t) arrays + per-frame diagnostics,
  - a checkpoint of the VO state (pose + frame index + previous-frame
    features) from which a run resumes exactly.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from tpu_vo.geometry import se3
from tpu_vo.geometry.se3 import Pose


def save_trajectory_tum(path: str, poses: Pose,
                        timestamps: Optional[np.ndarray] = None) -> None:
    R = np.asarray(poses.R, dtype=np.float64)
    t = np.asarray(poses.t, dtype=np.float64)
    n = len(t)
    ts = np.arange(n, dtype=np.float64) if timestamps is None else timestamps
    q = np.asarray(se3.rotation_to_quaternion(jnp.asarray(R)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(n):
            f.write(
                f"{ts[i]:.6f} {t[i,0]:.9f} {t[i,1]:.9f} {t[i,2]:.9f} "
                f"{q[i,0]:.9f} {q[i,1]:.9f} {q[i,2]:.9f} {q[i,3]:.9f}\n"
            )


def load_trajectory_tum(path: str) -> Tuple[np.ndarray, Pose]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.split()])
    arr = np.asarray(rows)
    ts = arr[:, 0]
    t = arr[:, 1:4]
    q = arr[:, 4:8]
    R = np.asarray(se3.quaternion_to_rotation(jnp.asarray(q)))
    return ts, Pose(jnp.asarray(R, dtype=jnp.float32),
                    jnp.asarray(t, dtype=jnp.float32))


def save_trajectory_kitti(path: str, poses: Pose) -> None:
    """KITTI odometry pose format: 12 numbers/row = T_wc[:3, :4] row-major.

    Same camera->world convention as the KITTI ground-truth files
    (io/kitti.load_kitti_poses), so estimates written here evaluate
    directly against poses/<NN>.txt with any standard odometry toolkit.
    """
    R = np.asarray(poses.R, dtype=np.float64)
    t = np.asarray(poses.t, dtype=np.float64)
    T = np.concatenate([R, t[..., None]], axis=-1).reshape(len(t), 12)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for row in T:
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def load_trajectory_kitti(path: str) -> Pose:
    """Inverse of save_trajectory_kitti (also reads ground-truth files)."""
    from tpu_vo.io.kitti import load_kitti_poses

    R, t = load_kitti_poses(path)
    return Pose(jnp.asarray(R, dtype=jnp.float32),
                jnp.asarray(t, dtype=jnp.float32))


def save_trajectory_npz(path: str, poses: Pose, diagnostics=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = {"R": np.asarray(poses.R), "t": np.asarray(poses.t)}
    if diagnostics:
        for k, v in diagnostics.items():
            data[f"diag_{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def save_checkpoint(path: str, state) -> None:
    """Persist a pipeline VOState (pose + prev features + counters)."""
    from tpu_vo.pipeline.step import VOState  # local import to avoid cycle

    assert isinstance(state, VOState)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    prev = state.prev
    np.savez_compressed(
        path,
        R=np.asarray(state.pose.R), t=np.asarray(state.pose.t),
        initialized=np.asarray(state.initialized),
        frame_idx=np.asarray(state.frame_idx),
        rng=np.asarray(state.rng),
        xy=np.asarray(prev.xy), response=np.asarray(prev.response),
        angle=np.asarray(prev.angle), octave=np.asarray(prev.octave),
        size=np.asarray(prev.size), desc=np.asarray(prev.desc),
        desc32=np.asarray(prev.desc32), valid=np.asarray(prev.valid),
    )


def load_checkpoint(path: str):
    from tpu_vo.features.orb import ORBFeatures
    from tpu_vo.pipeline.step import VOState

    z = np.load(path if path.endswith(".npz") else path + ".npz")
    prev = ORBFeatures(
        xy=jnp.asarray(z["xy"]), response=jnp.asarray(z["response"]),
        angle=jnp.asarray(z["angle"]), octave=jnp.asarray(z["octave"]),
        size=jnp.asarray(z["size"]), desc=jnp.asarray(z["desc"]),
        desc32=jnp.asarray(z["desc32"]), valid=jnp.asarray(z["valid"]),
    )
    return VOState(
        pose=Pose(jnp.asarray(z["R"]), jnp.asarray(z["t"])),
        prev=prev,
        initialized=jnp.asarray(bool(z["initialized"])),
        frame_idx=jnp.asarray(int(z["frame_idx"]), jnp.int32),
        rng=jnp.asarray(z["rng"]),
    )
