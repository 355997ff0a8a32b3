"""Steered rBRIEF-256 descriptors (WTA_K=2), cv2-compatible.

Replicates computeOrbDescriptors from OpenCV's orb.cpp (the descriptor
stage of the reference's detectAndCompute call, visual_odometry.cpp:113):
the standard 256-pair sampling pattern (recovered from cv2's public
behavior — tools/extract_orb_pattern.py) is rotated by the keypoint angle
in float32, offsets rounded half-to-even like cvRound, and bit k of byte
k//8 is [I_blur(p_2k) < I_blur(p_2k+1)].

The whole stage is one gather of (N, 512) samples from the blurred level
image plus vectorized compares and bit packing — no per-keypoint loops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpu_vo.features._orb_pattern import PATTERN_X, PATTERN_Y

_PX = np.asarray(PATTERN_X, dtype=np.float32)  # (512,)
_PY = np.asarray(PATTERN_Y, dtype=np.float32)


def steered_offsets(angles_deg: jax.Array):
    """Rotated integer sample offsets (dy, dx), each (N, 512).

    Matches OpenCV: a = cos(angle*pi/180), b = sin(...), column offset
    cvRound(x*a - y*b), row offset cvRound(x*b + y*a), all in float32.
    """
    ang = angles_deg.astype(jnp.float32) * np.float32(np.pi / 180.0)
    a = jnp.cos(ang)[:, None]
    b = jnp.sin(ang)[:, None]
    px = jnp.asarray(_PX)[None, :]
    py = jnp.asarray(_PY)[None, :]
    dx = jnp.round(px * a - py * b).astype(jnp.int32)
    dy = jnp.round(px * b + py * a).astype(jnp.int32)
    return dy, dx


def descriptor_bits(blurred: jax.Array, ys: jax.Array, xs: jax.Array,
                    angles_deg: jax.Array) -> jax.Array:
    """(N, 256) bool descriptor bits for keypoints on one pyramid level.

    blurred: (H, W) float32 Gaussian-blurred level image (integral grid).
    ys/xs: (N,) int32 keypoint coordinates on this level.
    """
    h, w = blurred.shape[-2], blurred.shape[-1]
    dy, dx = steered_offsets(angles_deg)
    sy = jnp.clip(ys[:, None] + dy, 0, h - 1)
    sx = jnp.clip(xs[:, None] + dx, 0, w - 1)
    vals = blurred[sy, sx]                 # (N, 512)
    return vals[:, 0::2] < vals[:, 1::2]   # (N, 256)


def pack_bits_u8(bits: jax.Array) -> jax.Array:
    """(N, 256) bool -> (N, 32) uint8, little bit-order (cv2 layout)."""
    b = bits.reshape(*bits.shape[:-1], 32, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint8)


def pack_bits_u32(bits: jax.Array) -> jax.Array:
    """(N, 256) bool -> (N, 8) uint32 lanes for popcount matching."""
    b = bits.reshape(*bits.shape[:-1], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_u8(desc: jax.Array) -> jax.Array:
    """(N, 32) uint8 -> (N, 256) bool (for tests/interop)."""
    bits = (desc[..., :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(*desc.shape[:-1], 256).astype(bool)
