"""Shape-robustness sweep for the Pallas kernels (VERDICT r2 next #5).

The round-2 benchmark artifact carried a stale lowering failure: the
selection kernel's packed-output block (1, rt//2, w_pad) violated the
(8, 128)-divisibility rule at a 4K pyramid level because _row_tile could
return a non-multiple-of-16 tile. These tests pin the whole class of bug:

  1. pure block-arithmetic constraints for every pyramid-level shape of
     the four benchmark resolutions plus odd sizes (fast; no kernel run);
  2. interpret-mode execution equality on odd/small shapes;
  3. an on-TPU lowering sweep (skipped off-TPU) that compiles the real
     Mosaic kernel for every level shape.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.image.pyramid import level_sizes

RESOLUTIONS = [(480, 640), (376, 1241), (1080, 1920), (2160, 3840)]
# Interpret-mode sweeps cost ~15-20 s per shape on the CPU host; CI
# keeps the two most-degenerate rows (near-tile-boundary width, tiny),
# the rest run nightly / in the TPU leg (VERDICT r3 next #8).
ODD = [(48, 129), (37, 43)]
ODD_NIGHTLY = [(61, 97), (100, 131)]
ODD_ALL = ODD + [pytest.param(*s, marks=pytest.mark.nightly)
                 for s in ODD_NIGHTLY]


def _all_level_shapes():
    shapes = set()
    for h, w in RESOLUTIONS:
        for lh, lw in level_sizes(h, w, 8, 1.2):
            shapes.add((lh, lw))
    shapes.update(ODD)
    return sorted(shapes)


@pytest.mark.parametrize("h,w", _all_level_shapes())
def test_select_block_arithmetic(h, w):
    """Every BlockSpec the selection kernel would emit satisfies the
    Pallas TPU divisibility rules (block dims multiples of (8, 128) or
    equal to the array dims) — for every benchmark pyramid-level shape."""
    from tpu_vo.ops.select_pallas import _row_tile

    w_pad = -(-w // 128) * 128
    rt = _row_tile(w_pad)
    h_even = h + (h % 2)
    h_pad = -(-h_even // rt) * rt
    # packed output: array (h_pad//2, w_pad), block (rt//2, w_pad)
    assert rt % 16 == 0, f"rt={rt} not 16-multiple (packed rows {rt//2})"
    assert (rt // 2) % 8 == 0
    assert (h_pad // 2) % (rt // 2) == 0
    # harris output: array (h_pad, w_pad), block (rt, w_pad)
    assert h_pad % rt == 0
    assert w_pad % 128 == 0
    # input block rows rt + 2*HALO need not align (full-array dim match)
    idx_bits = max(1, (h * w - 1).bit_length())
    assert idx_bits + 9 <= 32, "packed (score, idx) overflows int32"


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="interpret mode is platform-independent; over "
                           "the remote-TPU tunnel it devolves into per-op "
                           "round-trips (hangs)")
@pytest.mark.parametrize("h,w", ODD_ALL)
def test_select_interpret_odd_shapes(h, w, rng):
    """Interpret-mode execution of the selection kernel on odd sizes
    reproduces the XLA score map exactly (same check as the main parity
    test, swept over awkward shapes)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.features import fast
    from tpu_vo.features.orb import _border_mask
    from tpu_vo.ops.select_pallas import _bit_reverse, fused_select_maps

    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        packed, hmap, idx_bits = fused_select_maps(img, 10, 31)

    score, keep = fast.fast_score_map(img, 10)
    keep = fast.nonmax_suppress(score, keep) & _border_mask(h, w, 31)
    masked = np.where(np.asarray(keep), np.asarray(score), 0.0)

    rec = np.zeros((h, w), np.float32)
    pk = np.asarray(packed)
    nz = pk > 0
    mask = (1 << idx_bits) - 1
    if nz.any():
        idx = np.asarray(_bit_reverse(
            jnp.asarray(mask - (pk[nz] & mask)), idx_bits))
        rec[idx // w, idx % w] = pk[nz] >> idx_bits
    np.testing.assert_array_equal(rec, masked)


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="interpret mode is platform-independent; over "
                           "the remote-TPU tunnel it devolves into per-op "
                           "round-trips (hangs)")
@pytest.mark.parametrize("h,w", [
    (48, 131), (37, 43),
    pytest.param(61, 97, marks=pytest.mark.nightly),
    pytest.param(40, 40, marks=pytest.mark.nightly),
])
def test_patch_extraction_odd_and_small_shapes(h, w, rng):
    """extract_patches_pallas over odd level shapes, including levels
    smaller than the DMA window (which must take the XLA fallback instead
    of leaving output blocks uninitialized — ADVICE r2)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.features.patches import RAW_SIZE, extract_patches
    from tpu_vo.ops.patch_pallas import ROWS, extract_patches_pallas

    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    n = 9
    if h >= 63 and w >= 63:
        # contract region: keypoints >= 31 px inside (edgeThreshold keeps
        # production keypoints here) -> bit-identical to the XLA path
        ys = jnp.asarray(rng.integers(31, h - 31, n), dtype=jnp.int32)
        xs = jnp.asarray(rng.integers(31, w - 31, n), dtype=jnp.int32)
    else:
        ys = jnp.asarray(rng.integers(0, h, n), dtype=jnp.int32)
        xs = jnp.asarray(rng.integers(0, w, n), dtype=jnp.int32)
    ref = np.asarray(extract_patches(img, ys, xs))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(extract_patches_pallas(img, ys, xs))
        got2 = np.asarray(extract_patches_pallas(img, ys, xs))
    assert got.shape == (n, ROWS, RAW_SIZE)
    # deterministic at every shape (no uninitialized blocks)
    np.testing.assert_array_equal(got, got2)
    if h < ROWS or w < RAW_SIZE:
        # XLA fallback: bit-identical everywhere, any coordinates
        np.testing.assert_array_equal(got[:, :RAW_SIZE, :], ref)
    elif h >= 63 and w >= 63:
        np.testing.assert_array_equal(got[:, :RAW_SIZE, :], ref)
    # 48 <= h < 63 (or 43 <= w < 63): no keypoint survives the
    # edgeThreshold border at such a level, so slot values are free;
    # determinism is the only requirement (checked above).


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="real Mosaic lowering needs a TPU")
@pytest.mark.parametrize("h,w", _all_level_shapes())
def test_select_lowers_on_tpu(h, w):
    """Compile (not run) the real selection kernel at every benchmark
    pyramid-level shape — the exact failure mode recorded in round 2 was
    a lowering-time block error."""
    from tpu_vo.ops.select_pallas import fused_select_maps

    def f(img):
        return fused_select_maps(img, 10, 31)[:2]

    jax.jit(f).lower(
        jax.ShapeDtypeStruct((h, w), jnp.float32)).compile()


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="real Mosaic lowering needs a TPU")
@pytest.mark.parametrize("h,w", [(376, 1241), (480, 640), (2160, 3840),
                                 (63, 105), (48, 131), (61, 97), (37, 43)])
def test_patch_extraction_runs_on_tpu(h, w, rng):
    """Compile AND run the real Mosaic patch-extraction kernel (the
    phase-shifted-copy DMA design) against the XLA gather path — catches
    real-hardware semantics (DMA alignment, pltpu.roll lanes) the
    interpret-mode sweep can't."""
    from tpu_vo.features.patches import RAW_SIZE, extract_patches
    from tpu_vo.ops.patch_pallas import ROWS, extract_patches_pallas

    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    n = 64
    if h >= 63 and w >= 63:
        ys = jnp.asarray(rng.integers(31, h - 31, n), dtype=jnp.int32)
        xs = jnp.asarray(rng.integers(31, w - 31, n), dtype=jnp.int32)
    else:
        ys = jnp.asarray(rng.integers(0, h, n), dtype=jnp.int32)
        xs = jnp.asarray(rng.integers(0, w, n), dtype=jnp.int32)
    got = np.asarray(jax.jit(extract_patches_pallas)(img, ys, xs))
    got2 = np.asarray(jax.jit(extract_patches_pallas)(img, ys, xs))
    assert got.shape == (n, ROWS, RAW_SIZE)
    np.testing.assert_array_equal(got, got2)
    if h < ROWS or w < RAW_SIZE or (h >= 63 and w >= 63):
        ref = np.asarray(extract_patches(img, ys, xs))
        np.testing.assert_array_equal(got[:, :RAW_SIZE, :], ref)
