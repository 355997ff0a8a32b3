"""Pallas kernel correctness in interpret mode (CPU CI coverage)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.features import fast


@pytest.mark.slow
def test_fast_margin_pallas_matches_xla_interpret(rng):
    """The Pallas FAST kernel is bit-identical to the XLA formulation."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.ops.fast_pallas import fast_margin_pallas

    img = jnp.asarray(
        rng.integers(0, 255, size=(96, 200)).astype(np.float32))
    a_s, a_c = fast.fast_score_map(img, 10)
    with pltpu.force_tpu_interpret_mode():
        p_s, p_c = fast_margin_pallas(img, 10)
    np.testing.assert_array_equal(np.asarray(a_c), np.asarray(p_c))
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(p_s))


def test_descriptor_pallas_matches_xla_interpret(rng):
    """Experimental fused blur+sampling kernel: exact vs the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.features import brief
    from tpu_vo.image.filters import gaussian_blur
    from tpu_vo.ops.brief_pallas import descriptor_bits_pallas

    img = jnp.asarray(rng.integers(0, 255, size=(128, 384)).astype(np.float32))
    n = 24
    ys = jnp.asarray(rng.integers(35, 90, n), dtype=jnp.int32)
    xs = jnp.asarray(rng.integers(35, 350, n), dtype=jnp.int32)
    ang = jnp.asarray(rng.uniform(0, 360, n), dtype=jnp.float32)
    ref = brief.pack_bits_u32(
        brief.descriptor_bits(gaussian_blur(img), ys, xs, ang))
    with pltpu.force_tpu_interpret_mode():
        got = descriptor_bits_pallas(img, ys, xs, ang)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_orientation_prefix_equals_gather(rng):
    from tpu_vo.features import orientation

    img = jnp.asarray(np.round(
        rng.uniform(0, 255, size=(128, 256))).astype(np.float32))
    ys = jnp.asarray(rng.integers(20, 100, 64), dtype=jnp.int32)
    xs = jnp.asarray(rng.integers(20, 230, 64), dtype=jnp.int32)
    a = np.asarray(orientation.ic_angles_gather(img, ys, xs))
    b = np.asarray(orientation.ic_angles_prefix(img, ys, xs))
    np.testing.assert_array_equal(a, b)
