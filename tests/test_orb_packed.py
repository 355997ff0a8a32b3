"""Packed-canvas ORB layout vs the per-level path.

The packed layout is a retained architectural alternative (measured slower
on v5e, see orb.py docstring). It still uses the dense XLA stages and
lax.top_k tie order, while the production path selects stage-1 ties by
bit-reversed index (ops/select_pallas) — so agreement is asserted on the
keypoint SET (high overlap; only equal-FAST-score cutoff ties may differ)
and on exact per-keypoint attributes for the common subset.
"""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig
from tpu_vo.features.orb import detect_and_compute, detect_and_compute_packed


@pytest.mark.slow
def test_packed_matches_per_level(rng):
    img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    cfg = ORBConfig()
    a = detect_and_compute(jnp.asarray(img), cfg)
    b = detect_and_compute_packed(jnp.asarray(img), cfg)

    def keyed(f):
        out = {}
        valid = np.asarray(f.valid)
        xy = np.asarray(f.xy)
        for i in np.nonzero(valid)[0]:
            out[(round(float(xy[i, 0]), 3), round(float(xy[i, 1]), 3),
                 int(np.asarray(f.octave)[i]))] = i
        return out

    ka, kb = keyed(a), keyed(b)
    common = set(ka) & set(kb)
    overlap = len(common) / max(len(ka), len(kb), 1)
    assert overlap >= 0.97, f"keypoint-set overlap {overlap}"

    # exact agreement on every shared keypoint's attributes
    ia = np.asarray(sorted(ka[k] for k in common))
    ib = np.asarray([kb[k] for k in sorted(common, key=lambda k: ka[k])])
    for name in ("angle", "desc", "desc32", "response", "size"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name))[ia],
            np.asarray(getattr(b, name))[ib],
            err_msg=name,
        )
