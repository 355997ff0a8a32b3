"""Offline 3D trajectory renderer — GL-free port of trajectory_viewer.cpp.

Reproduces the Pangolin/OpenGL viewer's scene and its 7-view screenshot
writer (trajectory_viewer.cpp:66-233) as a small software renderer:

  scene (render_step, :94-153): world axes (len 0.5), 21x21 ground grid,
  green trajectory polyline, points (start red / end blue / middle green),
  current camera axes (0.3) + yellow frustum (0.25), historical axes and
  frusta every 10th pose (0.1 / 0.08) — frusta drawn looking along -Zc
  (:313-358, :265-300);

  camera model: ProjectionMatrix(1024, 768, 500, 500, 512, 389, 0.1, 1000)
  (:79) with ModelViewLookAt; screenshots frame the trajectory AABB with
  eye = center + max(2.5*extent, 1.0) * dir for the six axis views + iso
  (:170-226), written as JPEG quality 95 (:56).

Rendering is pure numpy + PIL (no GL/GUI dependency): lines are projected,
clipped at the near plane, and drawn with painter's ordering.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpu_vo.configs import ViewerConfig
from tpu_vo.geometry.se3 import Pose

Vec3 = np.ndarray


def look_at(eye: Vec3, center: Vec3, up: Vec3) -> Tuple[np.ndarray, Vec3]:
    """OpenGL-style view: returns (R_view (3,3), eye). Camera looks -z."""
    f = center - eye
    f = f / max(np.linalg.norm(f), 1e-12)
    upn = up / max(np.linalg.norm(up), 1e-12)
    s = np.cross(f, upn)
    s = s / max(np.linalg.norm(s), 1e-12)
    u = np.cross(s, f)
    R = np.stack([s, u, -f])  # rows: right, up, -forward
    return R, eye


class TrajectoryRenderer:
    """Draws the viewer scene into an RGB image for a given view."""

    def __init__(self, cfg: ViewerConfig = ViewerConfig()):
        self.cfg = cfg
        self._segments: List[Tuple[Vec3, Vec3, tuple, float]] = []
        self._points: List[Tuple[Vec3, tuple, float]] = []

    # -- scene assembly ----------------------------------------------------
    def _line(self, a, b, color, width=1.0):
        self._segments.append((np.asarray(a, float), np.asarray(b, float),
                               color, width))

    def _point(self, p, color, size=5.0):
        self._points.append((np.asarray(p, float), color, size))

    def _axes(self, origin, R_wc, length, width=2.0):
        o = np.asarray(origin, float)
        cols = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
        for k in range(3):
            d = R_wc[:, k].copy()
            if k == 2:
                d = -d  # visual forward is -Zc (trajectory_viewer.cpp:275)
            self._line(o, o + length * d, cols[k], width)

    def _frustum(self, pose_R, pose_t, scale, width=1.5):
        d = 1.0 * scale
        hw = 0.6 * scale
        hh = 0.4 * scale
        corners_c = np.array([
            [-hw, -hh, -d], [hw, -hh, -d], [hw, hh, -d], [-hw, hh, -d]
        ])
        O = pose_t
        P = (pose_R @ corners_c.T).T + pose_t
        yellow = (255, 255, 0)
        for i in range(4):
            self._line(O, P[i], yellow, width)
            self._line(P[i], P[(i + 1) % 4], yellow, width)

    def build_scene(self, poses: Pose) -> None:
        """Assemble segments/points from trajectory (render_step geometry)."""
        cfg = self.cfg
        self._segments.clear()
        self._points.clear()

        # world axes + grid
        self._axes(np.zeros(3), np.eye(3), cfg.axis_len)
        g, s = cfg.grid_size, cfg.grid_step
        grid_col = (77, 77, 77)
        for i in np.arange(-g, g + s / 2, s):
            self._line([-g, 0, i], [g, 0, i], grid_col, 1.0)
            self._line([i, 0, -g], [i, 0, g], grid_col, 1.0)

        R = np.asarray(poses.R, float)
        t = np.asarray(poses.t, float)
        n = len(t)
        if n == 0:
            return
        # polyline
        for i in range(n - 1):
            self._line(t[i], t[i + 1], (0, 255, 0), 2.0)
        # points: start red, end blue, middle green
        for i in range(n):
            col = ((255, 0, 0) if i == 0
                   else (0, 0, 255) if i == n - 1 else (0, 255, 0))
            self._point(t[i], col, 5.0)
        # current camera
        self._axes(t[-1], R[-1], cfg.cam_axis_len, 3.0)
        self._frustum(R[-1], t[-1], cfg.cam_frustum_scale)
        # history every N
        for i in range(0, n, cfg.history_every_n):
            self._axes(t[i], R[i], cfg.history_axis_len, 3.0)
            self._frustum(R[i], t[i], cfg.history_frustum_scale)

    # -- projection + raster ------------------------------------------------
    def render(self, eye: Vec3, center: Vec3, up: Vec3) -> np.ndarray:
        from PIL import Image, ImageDraw

        cfg = self.cfg
        Rv, eye = look_at(np.asarray(eye, float), np.asarray(center, float),
                          np.asarray(up, float))
        W, H = cfg.width, cfg.height
        im = Image.new("RGB", (W, H), (26, 26, 26))  # glClearColor 0.1
        draw = ImageDraw.Draw(im)

        def to_cam(p):
            return Rv @ (p - eye)

        def project(pc):
            z = -pc[2]
            u = cfg.cx + cfg.focal * pc[0] / z
            v_gl = cfg.cy + cfg.focal * pc[1] / z
            return (u, (H - 1) - v_gl)

        near = cfg.z_near
        for a, b, color, width in self._segments:
            pa, pb = to_cam(a), to_cam(b)
            za, zb = -pa[2], -pb[2]
            if za < near and zb < near:
                continue
            # clip at near plane
            if za < near:
                alpha = (near - za) / (zb - za)
                pa = pa + alpha * (pb - pa)
            elif zb < near:
                alpha = (near - zb) / (za - zb)
                pb = pb + alpha * (pa - pb)
            draw.line([project(pa), project(pb)], fill=color,
                      width=max(1, int(round(width))))
        for p, color, size in self._points:
            pc = to_cam(p)
            if -pc[2] < near:
                continue
            u, v = project(pc)
            r = size / 2.0
            draw.ellipse([u - r, v - r, u + r, v + r], fill=color)
        return np.asarray(im)


# Screenshot views: (tag, direction, up) — trajectory_viewer.cpp:194-202.
# AxisNegY -> up (0,-1,0); AxisZ -> up (0,0,1).
VIEWS = (
    ("posX", (+1, 0, 0), (0, -1, 0)),
    ("negX", (-1, 0, 0), (0, -1, 0)),
    ("posY", (0, +1, 0), (0, 0, 1)),
    ("negY", (0, -1, 0), (0, 0, 1)),
    ("posZ", (0, 0, +1), (0, -1, 0)),
    ("negZ", (0, 0, -1), (0, -1, 0)),
    ("iso", (+1, -1, -1), (0, -1, 0)),
)


def save_trajectory_screenshots(poses: Pose, out_dir: str,
                                cfg: ViewerConfig = ViewerConfig()) -> bool:
    """The 7-view export (save_trajectory_screenshots, :155-233)."""
    from PIL import Image

    t = np.asarray(poses.t, float)
    if len(t) == 0:
        return False
    os.makedirs(out_dir, exist_ok=True)

    mn = t.min(axis=0)
    mx = t.max(axis=0)
    center = 0.5 * (mn + mx)
    extent = float((mx - mn).max())
    dist = max(cfg.framing_factor * extent, cfg.framing_min_dist)

    renderer = TrajectoryRenderer(cfg)
    renderer.build_scene(poses)

    ok = True
    for tag, dirn, up in VIEWS:
        d = np.asarray(dirn, float)
        nd = np.linalg.norm(d)
        d = d / nd if nd > 1e-12 else np.array([0.0, 0.0, -1.0])
        eye = center + dist * d
        img = renderer.render(eye, center, np.asarray(up, float))
        path = os.path.join(out_dir, f"trajectory_view_from_{tag}.jpg")
        try:
            Image.fromarray(img).save(path, quality=cfg.jpeg_quality)
        except Exception:
            ok = False
    return ok
