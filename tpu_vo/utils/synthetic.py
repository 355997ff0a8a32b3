"""Synthetic VO sequences with known ground-truth camera motion.

Renders a camera trajectory over a two-depth-plane textured world via
plane-induced homographies (cv2.warpPerspective). Two planes at different
depths give real parallax, so essential-matrix estimation is
non-degenerate. Used by the e2e parity tests and benchmarks; the reference
repo itself ships no data (its Dataset_VO is gitignored), so a generator
is the reproducible substitute.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import cv2


def _texture(rng: np.random.Generator, size: int, blob_sigma: float) -> np.ndarray:
    img = rng.uniform(0, 255, (size, size)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), blob_sigma)
    return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)


def _plane_homography(K: np.ndarray, R_cw: np.ndarray, t_cw: np.ndarray,
                      z_plane: float, tex_size: int,
                      world_extent: float) -> np.ndarray:
    """Homography mapping texture pixels -> image pixels for plane z=z_plane.

    Texture pixel (u, v) maps to world (X, Y) = ((u, v)/tex_size - 0.5) *
    world_extent on the plane; the camera projects x = K (R_cw X_w + t_cw).
    """
    s = world_extent / tex_size
    # world point: X = s*u - world_extent/2, Y = s*v - we/2, Z = z_plane
    A = np.array(
        [[s, 0, -world_extent / 2],
         [0, s, -world_extent / 2],
         [0, 0, 1]], dtype=np.float64
    )
    M = np.column_stack([R_cw[:, 0], R_cw[:, 1],
                         R_cw[:, 2] * z_plane + t_cw])
    return K @ M @ A


def make_sequence(
    n_frames: int = 30,
    width: int = 640,
    height: int = 480,
    seed: int = 0,
    step_t: Tuple[float, float, float] = (0.22, 0.0, 0.06),
    yaw_per_frame_deg: float = 0.5,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray], np.ndarray]:
    """Returns (frames, R_wc_list, t_wc_list, K).

    Frames are uint8 grayscale (height, width). Poses are camera->world
    (the project-wide convention, pose.h:26-31). The intrinsics follow the
    reference's rule fx=fy=width (visual_odometry.cpp:90-98) so both
    pipelines use consistent K.
    """
    rng = np.random.default_rng(seed)
    K = np.array([[width, 0, width / 2.0],
                  [0, width, height / 2.0],
                  [0, 0, 1.0]], dtype=np.float64)

    tex_far = _texture(rng, 1536, 2.2)
    tex_near = _texture(rng, 1024, 1.8)
    # Foreground plane occupies scattered patches (so the far plane shows).
    mask = np.zeros((1024, 1024), dtype=np.uint8)
    for _ in range(60):
        cx, cy = rng.integers(0, 1024, 2)
        r = int(rng.integers(30, 90))
        cv2.circle(mask, (int(cx), int(cy)), r, 255, -1)

    z_far, z_near = 10.0, 6.0
    extent_far, extent_near = 28.0, 18.0

    frames = []
    Rs, ts = [], []
    yaw_step = np.deg2rad(yaw_per_frame_deg)
    for i in range(n_frames):
        yaw = yaw_step * i
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
        t_wc = np.asarray(step_t, dtype=np.float64) * i
        Rs.append(R_wc)
        ts.append(t_wc)

        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        H_far = _plane_homography(K, R_cw, t_cw, z_far, 1536, extent_far)
        H_near = _plane_homography(K, R_cw, t_cw, z_near, 1024, extent_near)

        far = cv2.warpPerspective(tex_far, H_far, (width, height),
                                  flags=cv2.INTER_LINEAR,
                                  borderMode=cv2.BORDER_REFLECT_101)
        near = cv2.warpPerspective(tex_near, H_near, (width, height),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_REFLECT_101)
        near_mask = cv2.warpPerspective(mask, H_near, (width, height),
                                        flags=cv2.INTER_NEAREST,
                                        borderMode=cv2.BORDER_CONSTANT,
                                        borderValue=0)
        frame = np.where(near_mask > 0, near, far)
        frames.append(frame)

    return frames, Rs, ts, K


def write_dataset(path: str, frames: List[np.ndarray]) -> None:
    """Write frames as zero-padded PNGs (the reference's dataset layout)."""
    import os

    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(path, f"{i:06d}.png"), f)
