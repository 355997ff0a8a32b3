"""tpu_vo — a TPU-native monocular visual-odometry framework.

A ground-up JAX/XLA/Pallas re-design of the classic monocular VO pipeline
(reference behavior: /root/reference/src/visual_odometry.cpp): ORB feature
detection, brute-force Hamming matching, essential-matrix RANSAC, cheirality-
checked pose recovery, and world-trajectory composition — restructured as
pure, fixed-shape, jit-compiled compute stages that batch over frames and
shard over TPU meshes instead of looping frame-by-frame on the host.

Package map (see SURVEY.md §7):
  geometry/    SE3 poses, intrinsics, epipolar algebra, triangulation
  image/       grayscale, pyramid, Gaussian blur
  features/    FAST / Harris / NMS / orientation / rBRIEF / full ORB
  ops/         Pallas TPU kernels (FAST score, Hamming popcount-matmul)
  matching/    Hamming distances, mutual-NN cross-check, adaptive filter
  estimation/  8-point + Nister 5-point solvers, vmapped RANSAC, recover_pose
  pipeline/    the jittable vo_step, scan runners, batched/sharded pipelines
  parallel/    meshes, shardings, associative pose scan across devices
  io/          dataset enumeration, packed-sequence format, async loader
  viz/         host-side overlays, offline trajectory renderer, epipolar tool
"""

from tpu_vo.configs import (
    MatchConfig,
    ORBConfig,
    RansacConfig,
    VOConfig,
    ViewerConfig,
)
from tpu_vo.geometry.se3 import Pose

__version__ = "0.1.0"

__all__ = [
    "Pose",
    "ORBConfig",
    "MatchConfig",
    "RansacConfig",
    "VOConfig",
    "ViewerConfig",
    "__version__",
]
