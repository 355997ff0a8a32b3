"""Object-style API mirroring the reference's public surface.

The reference exposes (visual_odometry.h:31-66, frame.h:19-58,
trajectory_viewer.h:10-34):

    Frame(id, image) with .keypoints/.descriptors/.pose/.timestamp
    VisualOdometry(width, height).process_frame(frame) -> overlay image
    .get_trajectory() / .get_trajectory_poses() / .has_last_F() / .last_F()
    TrajectoryViewer().init()/render_step(poses)/save_trajectory_screenshots()

This module provides the same ergonomics over the pure jitted pipeline:
state lives in the wrapper, compute stays functional and compiled once.
Python-side locking matches the reference's trajectory mutex (here only
needed if the caller shares the object across threads).
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpu_vo.configs import VOConfig
from tpu_vo.geometry.se3 import Pose
from tpu_vo.pipeline.step import VOState, initial_state, vo_step
from tpu_vo.utils.records import step_record
from tpu_vo.viz.overlay import draw_keypoints_overlay


@dataclass
class Frame:
    """One time-step: image + features + pose estimate (frame.h:19-58)."""

    id: int = -1
    image: Optional[np.ndarray] = None
    timestamp: float = 0.0
    processed: bool = False
    keypoints: Optional[np.ndarray] = None    # (N, 2) xy, valid rows only
    descriptors: Optional[np.ndarray] = None  # (N, 32) uint8
    pose: Pose = field(default_factory=lambda: Pose.identity())

    @classmethod
    def from_image(cls, frame_id: int, image: np.ndarray,
                   timestamp: float = 0.0) -> "Frame":
        return cls(id=frame_id, image=np.asarray(image), timestamp=timestamp)


class VisualOdometry:
    """Stateful facade over the jitted vo_step (visual_odometry.h:31-66)."""

    def __init__(self, image_width: int, image_height: int,
                 config: Optional[VOConfig] = None, seed: int = 0):
        self.config = config or VOConfig(image_width=image_width,
                                         image_height=image_height)
        assert self.config.image_width == image_width
        assert self.config.image_height == image_height
        self._step = jax.jit(functools.partial(vo_step, cfg=self.config))
        self._state: VOState = initial_state(self.config, seed)
        self._lock = threading.Lock()
        self._trajectory: List[Pose] = []
        self._records: List[dict] = []
        self._last_F: Optional[np.ndarray] = None

    @property
    def camera_matrix(self) -> np.ndarray:
        fx, fy, cx, cy = self.config.intrinsics
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    def process_frame(self, frame: Frame,
                      render_overlay: bool = False) -> Optional[np.ndarray]:
        """Run one frame; updates frame.pose and the trajectory.

        Mirrors VisualOdometry::process_frame (visual_odometry.cpp:323-378)
        including its failure ladder. Returns the keypoint overlay image
        when render_overlay=True (the reference always rendered it).
        """
        img = frame.image
        if img is None:
            raise ValueError("frame has no image")
        if img.ndim == 3:
            from tpu_vo.image.color import bgr_to_gray

            img = np.asarray(bgr_to_gray(jnp.asarray(img)))
        self._state, out = self._step(self._state, jnp.asarray(img))

        pose = Pose(np.asarray(out.pose.R), np.asarray(out.pose.t))
        frame.pose = pose
        frame.processed = True
        rec = step_record(frame.id, out)
        with self._lock:
            self._trajectory.append(pose)
            self._records.append(rec)
            if bool(out.has_F):
                self._last_F = np.asarray(out.F)

        overlay = None
        if render_overlay:
            feats = jax.tree.map(np.asarray, self._state.prev)
            valid = feats.valid
            frame.keypoints = feats.xy[valid]
            frame.descriptors = feats.desc[valid]
            overlay = draw_keypoints_overlay(img, self._state.prev)
        return overlay

    # --- reference getters -------------------------------------------------
    def get_trajectory(self) -> List[np.ndarray]:
        """Camera centers, like get_trajectory (visual_odometry.cpp:380)."""
        with self._lock:
            return [np.asarray(p.t) for p in self._trajectory]

    def get_trajectory_poses(self) -> List[Pose]:
        with self._lock:
            return list(self._trajectory)

    def get_records(self) -> List[dict]:
        """Structured per-frame diagnostics (replaces stdout scraping)."""
        with self._lock:
            return list(self._records)

    def has_last_F(self) -> bool:
        return self._last_F is not None

    def last_F(self) -> np.ndarray:
        if self._last_F is None:
            raise RuntimeError("no fundamental matrix computed yet")
        return self._last_F

    # --- checkpoint/resume --------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        from tpu_vo.io.trajectory_io import save_checkpoint

        save_checkpoint(path, self._state)

    def restore_checkpoint(self, path: str) -> None:
        from tpu_vo.io.trajectory_io import load_checkpoint

        self._state = load_checkpoint(path)


class TrajectoryViewer:
    """Facade matching trajectory_viewer.h:10-34 over the software renderer.

    render_step() draws the scene; with show=True and a GUI-capable cv2 it
    displays a live window (the reference's Pangolin window), otherwise it
    just keeps the last rendered frame available as .last_frame.
    """

    def __init__(self, show: bool = False):
        from tpu_vo.configs import ViewerConfig
        from tpu_vo.viz.trajectory import TrajectoryRenderer

        self.cfg = ViewerConfig()
        self._renderer = TrajectoryRenderer(self.cfg)
        self._initialized = False
        self._show = show
        self._quit = False
        self.last_frame: Optional[np.ndarray] = None

    def init(self) -> None:
        self._initialized = True

    def should_quit(self) -> bool:
        return self._quit

    def _stack(self, poses: List[Pose]) -> Pose:
        R = jnp.asarray(np.stack([np.asarray(p.R) for p in poses]))
        t = jnp.asarray(np.stack([np.asarray(p.t) for p in poses]))
        return Pose(R, t)

    def render_step(self, trajectory: List[Pose]) -> Optional[np.ndarray]:
        self.init()
        if not trajectory:
            return None
        poses = self._stack(trajectory)
        self._renderer.build_scene(poses)
        center = np.asarray(poses.t).mean(axis=0)
        k = 0.1
        eye = center + np.array([2 * k, -5 * k, -10 * k]) * 10
        self.last_frame = self._renderer.render(eye, center,
                                                np.array([0.0, -1.0, 0.0]))
        if self._show:
            try:
                import cv2

                cv2.imshow("Visual Odometry: Trajectory",
                           self.last_frame[..., ::-1])
                if cv2.waitKey(1) in (27, ord("q")):
                    self._quit = True
            except Exception:
                pass
        return self.last_frame

    def save_trajectory_screenshots(self, trajectory: List[Pose],
                                    out_dir: str) -> bool:
        from tpu_vo.viz.trajectory import save_trajectory_screenshots

        if not trajectory:
            return False
        return save_trajectory_screenshots(self._stack(trajectory), out_dir,
                                           self.cfg)
