"""Host-side keypoint overlay rendering (PIL; compute graph stays pure).

Equivalent of render_current_frame_with_keypoints_overlay
(visual_odometry.cpp:283-290): cv::drawKeypoints with
DRAW_RICH_KEYPOINTS draws, per keypoint, a circle of radius size/2 and a
radius line at the keypoint angle, in green on the BGR frame. The
reference runs this inside process_frame; here it is explicitly outside
the jitted step (the north-star design keeps compute pure).
"""

from __future__ import annotations

import numpy as np


def draw_keypoints_overlay(image: np.ndarray, features,
                           color=(0, 255, 0)) -> np.ndarray:
    """Render rich keypoints. image: (H, W) gray or (H, W, 3) RGB uint8.

    features: ORBFeatures (or any object with .xy, .size, .angle, .valid
    numpy-convertible fields). Returns (H, W, 3) RGB uint8.
    """
    from PIL import Image, ImageDraw

    if image.ndim == 2:
        rgb = np.stack([image] * 3, axis=-1)
    else:
        rgb = image
    im = Image.fromarray(rgb.astype(np.uint8))
    draw = ImageDraw.Draw(im)

    xy = np.asarray(features.xy)
    size = np.asarray(features.size)
    angle = np.asarray(features.angle)
    valid = np.asarray(features.valid)

    for i in np.nonzero(valid)[0]:
        x, y = float(xy[i, 0]), float(xy[i, 1])
        r = float(size[i]) / 2.0
        draw.ellipse([x - r, y - r, x + r, y + r], outline=color, width=1)
        a = np.deg2rad(float(angle[i]))
        draw.line([x, y, x + r * np.cos(a), y + r * np.sin(a)],
                  fill=color, width=1)
    return np.asarray(im)
