"""Intensity-centroid keypoint orientation (ORB's ICAngles), cv2-exact.

Replicates ICAngles from OpenCV's orb.cpp: image moments m01/m10 over the
circular patch of radius 15 (the umax table is rebuilt with the same
algorithm, including its symmetry fix-up), and OpenCV's fastAtan2
polynomial approximation in degrees — reproduced bit-level so descriptor
steering (cvRound of rotated offsets) picks the same sample positions.

Dense formulation: the two moment maps are 31x31 correlations of the
image, evaluated once per pyramid level and gathered at keypoints.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

HALF_PATCH = 15


def build_umax(half_patch: int = HALF_PATCH) -> np.ndarray:
    """OpenCV's umax table: horizontal extent of the circular patch per row."""
    umax = np.zeros(half_patch + 2, dtype=np.int32)
    vmax = int(np.floor(half_patch * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(half_patch * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(np.round(np.sqrt(half_patch * half_patch - v * v)))
    # Symmetry fix-up (orb.cpp): make the circle 8-way symmetric.
    v0 = 0
    for v in range(half_patch, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: half_patch + 1]


def moment_kernels(half_patch: int = HALF_PATCH):
    """(Ku, Kv): 31x31 kernels with u / v weights inside the circular mask."""
    umax = build_umax(half_patch)
    size = 2 * half_patch + 1
    Ku = np.zeros((size, size), dtype=np.float32)
    Kv = np.zeros((size, size), dtype=np.float32)
    for v in range(-half_patch, half_patch + 1):
        d = umax[abs(v)]
        for u in range(-d, d + 1):
            Ku[v + half_patch, u + half_patch] = u
            Kv[v + half_patch, u + half_patch] = v
    return Ku, Kv


_KU, _KV = moment_kernels()


def fast_atan2_deg(y: jax.Array, x: jax.Array) -> jax.Array:
    """OpenCV cv::fastAtan2: polynomial atan in float32, degrees [0, 360)."""
    f32 = jnp.float32
    deg = np.float32(180.0 / np.pi)
    p1 = np.float32(0.9997878412794807) * deg
    p3 = np.float32(-0.3258083974640975) * deg
    p5 = np.float32(0.1555786518463281) * deg
    p7 = np.float32(-0.04432655554792128) * deg
    eps = np.float32(2.220446049250313e-16)  # (float)DBL_EPSILON

    x = x.astype(f32)
    y = y.astype(f32)
    ax, ay = jnp.abs(x), jnp.abs(y)
    c_lo = ay / (ax + eps)
    c_hi = ax / (ay + eps)
    c = jnp.where(ax >= ay, c_lo, c_hi)
    c2 = c * c
    poly = (((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c
    a = jnp.where(ax >= ay, poly, np.float32(90.0) - poly)
    a = jnp.where(x < 0, np.float32(180.0) - a, a)
    a = jnp.where(y < 0, np.float32(360.0) - a, a)
    return a


def moment_maps(img: jax.Array):
    """(m01, m10) dense moment maps via 31x31 correlation."""
    x = img.astype(jnp.float32)[None, None]  # NCHW
    k = jnp.stack([jnp.asarray(_KV), jnp.asarray(_KU)])[:, None]  # OIHW (2,1,31,31)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out[0], out[1]  # m01 (v-weighted), m10 (u-weighted)


def ic_angles(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Orientation in degrees at integer keypoint locations."""
    m01, m10 = moment_maps(img)
    return fast_atan2_deg(m01[ys, xs], m10[ys, xs])


def _circle_offsets(half_patch: int = HALF_PATCH):
    """Static (P, 2) int offsets and (P,) u/v weights of the circular patch."""
    umax = build_umax(half_patch)
    offs, us, vs = [], [], []
    for v in range(-half_patch, half_patch + 1):
        d = umax[abs(v)]
        for u in range(-d, d + 1):
            offs.append((v, u))
            us.append(u)
            vs.append(v)
    return (np.asarray(offs, dtype=np.int32),
            np.asarray(us, dtype=np.float32),
            np.asarray(vs, dtype=np.float32))


_OFFS, _US, _VS = _circle_offsets()


def ic_angles_prefix(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Orientation via horizontal prefix sums — the TPU fast path.

    Each circular-patch row contributes sum_{u=-d..d} u*I and sum I, both
    expressible as two prefix-sum differences, so the per-keypoint gather
    shrinks from 725 patch pixels to 31 rows x 4 prefix values. All
    accumulation is int32 (images are integral-valued), so the result is
    exactly the gather/dense formulation.
    """
    h, w = img.shape[-2], img.shape[-1]
    umax = build_umax()
    ii = jnp.round(img).astype(jnp.int32)
    x_idx = jnp.arange(w, dtype=jnp.int32)
    P0 = jnp.pad(jnp.cumsum(ii, axis=-1), ((0, 0), (1, 0)))
    P1 = jnp.pad(jnp.cumsum(ii * x_idx[None, :], axis=-1), ((0, 0), (1, 0)))

    v = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.int32)   # (31,)
    d = jnp.asarray(umax, dtype=jnp.int32)[jnp.abs(v)]             # (31,)
    rows = jnp.clip(ys[:, None] + v[None, :], 0, h - 1)            # (N, 31)
    hi = jnp.clip(xs[:, None] + d[None, :] + 1, 0, w)
    lo = jnp.clip(xs[:, None] - d[None, :], 0, w)
    s0 = P0[rows, hi] - P0[rows, lo]                               # (N, 31)
    s1 = P1[rows, hi] - P1[rows, lo]
    m10 = jnp.sum(s1 - xs[:, None] * s0, axis=1)
    m01 = jnp.sum(v[None, :] * s0, axis=1)
    return fast_atan2_deg(m01.astype(jnp.float32), m10.astype(jnp.float32))


def ic_angles_gather(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Orientation via sparse patch gather — O(N * patch) instead of a dense
    31x31 correlation over the whole level; the production ORB path."""
    h, w = img.shape[-2], img.shape[-1]
    offs = jnp.asarray(_OFFS)
    sy = jnp.clip(ys[:, None] + offs[None, :, 0], 0, h - 1)
    sx = jnp.clip(xs[:, None] + offs[None, :, 1], 0, w - 1)
    vals = img[sy, sx].astype(jnp.float32)          # (N, P)
    m10 = vals @ jnp.asarray(_US)
    m01 = vals @ jnp.asarray(_VS)
    return fast_atan2_deg(m01, m10)
