"""Image ops golden tests vs cv2: grayscale, resize, Gaussian blur."""

import cv2
import numpy as np
import jax.numpy as jnp

from tpu_vo.image import color, filters, pyramid


def test_bgr_to_gray_bit_exact(rng):
    img = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    ours = np.asarray(color.bgr_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_rgb_to_gray_bit_exact(rng):
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    ours = np.asarray(color.rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_ensure_gray_passthrough(rng):
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    out = np.asarray(color.ensure_gray(jnp.asarray(img)))
    np.testing.assert_array_equal(out, img)


def test_resize_bilinear_matches_cv2(rng):
    img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
    for (oh, ow) in [(100, 133), (60, 80), (83, 97)]:
        ours = np.asarray(
            pyramid.resize_bilinear(jnp.asarray(img), oh, ow)
        ).astype(np.int32)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR
                         ).astype(np.int32)
        diff = np.abs(ours - ref)
        # float bilinear vs cv2's fixed point: off-by-one at rounding ties
        assert (diff <= 1).mean() > 0.999, f"{(oh,ow)}: {diff.max()}"
        assert diff.max() <= 2


def test_level_sizes_match_cv_round():
    sizes = pyramid.level_sizes(376, 1241, 8, 1.2)
    assert sizes[0] == (376, 1241)
    s = 1.2
    for lvl in range(1, 8):
        h, w = sizes[lvl]
        assert h == round(376 / 1.2 ** lvl)
        assert w == round(1241 / 1.2 ** lvl)


def test_gaussian_kernel_matches_cv2():
    ours = filters.gaussian_kernel_1d(7, 2.0)
    ref = cv2.getGaussianKernel(7, 2.0).ravel()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_gaussian_blur_close_to_cv2(rng):
    img = rng.integers(0, 256, size=(96, 128), dtype=np.uint8)
    ours = np.asarray(filters.gaussian_blur(jnp.asarray(img, dtype=jnp.float32)))
    ref = cv2.GaussianBlur(img, (7, 7), 2,
                           borderType=cv2.BORDER_REFLECT_101).astype(np.float32)
    diff = np.abs(ours - ref)
    # cv2's uint8 path is fixed-point; ours is float32 + round: +-1 wobble
    assert diff.max() <= 1.0
    assert (diff == 0).mean() > 0.7


def test_pyramid_levels_close_to_cv2_cascade(rng):
    """Our cascade matches a cv2-resize cascade within quantization noise."""
    img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    levels = pyramid.build_pyramid(jnp.asarray(img), 8, 1.2)
    prev = img.copy()
    for lvl in range(1, 8):
        h, w = pyramid.level_sizes(120, 160, 8, 1.2)[lvl]
        prev = cv2.resize(prev, (w, h), interpolation=cv2.INTER_LINEAR)
        ours = np.asarray(levels[lvl])
        assert ours.shape == (h, w)
        diff = np.abs(ours.astype(np.int32) - prev.astype(np.int32))
        assert np.mean(diff <= 2) > 0.99, f"level {lvl}: mean diff {diff.mean()}"


def test_resize_banded_bit_identical_to_dense(rng):
    """The block-banded interpolation matmul (used when src > 512) is
    numerically equivalent to the dense form: the dropped matmul terms
    are exact float zeros, so any difference comes only from the
    backend's FMA/reassociation choices for the differently-shaped
    contraction (~1 ulp at intensity scale on XLA CPU). Sweep shapes
    that cross the banded threshold on one or both axes, including 4K
    level-0->1."""
    from tpu_vo.image import pyramid as P

    cases = [(480, 640, 400, 533), (376, 1241, 313, 1034),
             (600, 300, 500, 250), (2160, 3840, 1800, 3200),
             (520, 513, 433, 428)]
    for h, w, oh, ow in cases:
        img = jnp.asarray(
            rng.integers(0, 255, size=(h, w)).astype(np.float32))
        banded = P.resize_bilinear(img, oh, ow)

        Mr = jnp.asarray(P._resize_matrix(oh, h))
        Mc = jnp.asarray(P._resize_matrix(ow, w))
        dense = jnp.einsum("wo,...hw->...ho", Mc,
                           jnp.einsum("ho,...hw->...ow", Mr, img))
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(dense), atol=1e-3, rtol=0,
            err_msg=f"{(h, w)} -> {(oh, ow)}")
