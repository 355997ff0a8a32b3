from tpu_vo.viz.overlay import draw_keypoints_overlay
from tpu_vo.viz.trajectory import TrajectoryRenderer, save_trajectory_screenshots
from tpu_vo.viz.epipolar import render_epipolar_pair, clip_line_to_image

__all__ = [
    "draw_keypoints_overlay",
    "TrajectoryRenderer",
    "save_trajectory_screenshots",
    "render_epipolar_pair",
    "clip_line_to_image",
]
