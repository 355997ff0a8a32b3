from tpu_vo.geometry.se3 import Pose
from tpu_vo.geometry import camera, epipolar, se3, triangulation

__all__ = ["Pose", "se3", "camera", "epipolar", "triangulation"]
