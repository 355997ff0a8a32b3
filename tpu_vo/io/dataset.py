"""Dataset enumeration and frame decode, matching main.cpp semantics.

- list_image_paths: regular files with extension .png/.jpg/.jpeg
  (case-insensitive), lexicographically sorted (main.cpp:26-49).
- parse_timestamp: std::stod on the filename stem, falling back to the
  frame index (main.cpp:146-151). stod parses a leading numeric prefix.
- load_frame: decode to grayscale uint8 via PIL (BGR->gray happens in the
  jitted graph when a color array is fed; PIL gives RGB so we convert with
  the matching RGB weights here on the host).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

_EXTS = {".png", ".jpg", ".jpeg"}
_STOD = re.compile(r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)")


def list_image_paths(dataset_path: str) -> List[str]:
    """Enumerate + sort image files exactly like load_image_paths."""
    paths = []
    for entry in os.scandir(dataset_path):
        if not entry.is_file():
            continue
        ext = os.path.splitext(entry.name)[1].lower()
        if ext in _EXTS:
            paths.append(entry.path)
    paths.sort()
    return paths


def autodetect_dataset(cli_arg: Optional[str] = None) -> Optional[str]:
    """CLI arg, else data/Dataset_VO, else Dataset_VO (main.cpp:59-73)."""
    if cli_arg:
        return cli_arg
    for cand in ("data/Dataset_VO", "Dataset_VO"):
        if os.path.isdir(cand):
            return cand
    return None


def parse_timestamp(path: str, index: int) -> float:
    """std::stod(stem) with fallback to the frame index."""
    stem = os.path.splitext(os.path.basename(path))[0]
    m = _STOD.match(stem.strip())
    if m:
        try:
            return float(m.group(0))
        except ValueError:
            pass
    return float(index)


def load_frame(path: str, gray: bool = True) -> np.ndarray:
    """Decode an image file to uint8 (H, W) gray or (H, W, 3) RGB."""
    from PIL import Image

    with Image.open(path) as im:
        if gray:
            if im.mode != "L":
                # BT.601 integer weights matching tpu_vo.image.color
                rgb = np.asarray(im.convert("RGB"), dtype=np.int64)
                y = (rgb[..., 2] * 3735 + rgb[..., 1] * 19235
                     + rgb[..., 0] * 9798 + (1 << 14)) >> 15
                return y.astype(np.uint8)
            return np.asarray(im, dtype=np.uint8)
        return np.asarray(im.convert("RGB"), dtype=np.uint8)
