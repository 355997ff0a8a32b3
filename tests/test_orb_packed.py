"""Packed-canvas ORB layout must be bit-identical to the per-level path."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig
from tpu_vo.features.orb import detect_and_compute, detect_and_compute_packed


@pytest.mark.slow
def test_packed_equals_per_level(rng):
    img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    cfg = ORBConfig()
    a = detect_and_compute(jnp.asarray(img), cfg)
    b = detect_and_compute_packed(jnp.asarray(img), cfg)
    for name in ("xy", "angle", "octave", "desc", "desc32", "valid",
                 "response", "size"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )
