"""Device mesh construction helpers.

The reference is single-process/single-thread (SURVEY.md §2c); scaling in
tpu_vo comes from jax.sharding meshes: a "data" axis shards independent
sequences (DP) and a "seq" axis shards frames within a sequence (the VO
analog of sequence parallelism — legal because feature extraction is
per-frame and pose chaining is an associative scan).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "seq"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on one "data" x "seq" grid, with "seq" kept at 1
    unless the device count has a convenient factor. Pass explicit
    axis_sizes (e.g. (4, 2)) for a specific layout.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if axis_sizes is None:
        axis_sizes = (n, 1) if len(axis_names) == 2 else (n,)
    total = int(np.prod(axis_sizes))
    assert total == n, f"mesh {axis_sizes} != {n} devices"
    arr = np.asarray(devs).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names)[: arr.ndim])
