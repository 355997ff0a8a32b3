"""Pallas kernel correctness in interpret mode (CPU CI coverage)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.features import fast

# Interpret mode is platform-independent but devolves into per-op tunnel
# round-trips on the remote-TPU backend (hangs/wedges the client — it
# took the whole round-4 TPU test leg down with it); the on-chip kernel
# parity coverage lives in test_pallas_shapes' *_on_tpu sweeps instead.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode tests run on the CPU backend only")


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


def test_orientation_prefix_equals_gather(rng):
    from tpu_vo.features import orientation

    img = jnp.asarray(np.round(
        rng.uniform(0, 255, size=(128, 256))).astype(np.float32))
    ys = jnp.asarray(rng.integers(20, 100, 64), dtype=jnp.int32)
    xs = jnp.asarray(rng.integers(20, 230, 64), dtype=jnp.int32)
    a = np.asarray(orientation.ic_angles_gather(img, ys, xs))
    b = np.asarray(orientation.ic_angles_prefix(img, ys, xs))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_select_maps_matches_xla_interpret(rng):
    """Fused selection kernel (FAST+NMS+border+Harris+pack+pool): the
    unpacked score map and the dense Harris map are bit-identical to the
    XLA formulation. Candidate tie ORDER at equal FAST scores differs from
    lax.top_k's (ours is deterministic ascending-index; lax.top_k's is
    unspecified) — equivalence is at the map level."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.features import harris
    from tpu_vo.features.orb import _border_mask
    from tpu_vo.ops.select_pallas import fused_select_maps

    h, w = 96, 200
    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        packed, hmap, idx_bits = fused_select_maps(img, 10, 31)

    score, keep = fast.fast_score_map(img, 10)
    keep = fast.nonmax_suppress(score, keep) & _border_mask(h, w, 31)
    masked = np.where(np.asarray(keep), np.asarray(score), 0.0)
    href = np.asarray(harris.harris_response_map(img))

    # unpack the pooled (score, key) map back into a dense score map
    from tpu_vo.ops.select_pallas import _bit_reverse

    rec = np.zeros((h, w), np.float32)
    pk = np.asarray(packed)
    nz = pk > 0
    mask = (1 << idx_bits) - 1
    idx = np.asarray(_bit_reverse(
        jnp.asarray(mask - (pk[nz] & mask)), idx_bits))
    rec[idx // w, idx % w] = pk[nz] >> idx_bits
    np.testing.assert_array_equal(rec, masked)

    inner = np.zeros((h, w), bool)
    inner[31:-31, 31:-31] = True
    got = np.asarray(hmap)[:h, :w]
    # bit-exact on TPU (verified on-device); the CPU interpreter contracts
    # a*b-c*c with FMA differently from the XLA CPU path -> ~1 ulp
    np.testing.assert_allclose(got[inner], href[inner], rtol=2e-6,
                               atol=1e-12)


def test_extract_patches_pallas_matches_xla_interpret(rng):
    """DMA patch-extraction kernel: rows [:43] bit-identical to the
    vmapped-dynamic_slice formulation for interior keypoints."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.features.patches import extract_patches
    from tpu_vo.ops.patch_pallas import extract_patches_pallas

    h, w = 96, 300
    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    n = 17
    ys = jnp.asarray(rng.integers(31, h - 31, n), dtype=jnp.int32)
    xs = jnp.asarray(rng.integers(31, w - 31, n), dtype=jnp.int32)
    ref = np.asarray(extract_patches(img, ys, xs))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(extract_patches_pallas(img, ys, xs))
    np.testing.assert_array_equal(got[:, :43, :], ref)


def test_nested_vmap_collapses_to_kernel_batch(rng):
    """DP-runner regression (round 3): stacking vmaps (sequences x frames,
    as run_batch_of_sequences does over _chunked_map) must collapse into
    the kernels' batch grid axis. The default Pallas batching rule cannot
    add a dimension to the ANY-space HBM operands the DMA kernels read
    (select band fetch, patch extraction), so without the recursive
    custom_vmap rules this raises a lowering ValueError on TPU."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_vo.ops.fast_pallas import fast_margin_pallas
    from tpu_vo.ops.patch_pallas import extract_patches_pallas
    from tpu_vo.ops.select_pallas import fused_select_maps

    h, w = 96, 200
    B, F = 2, 3
    imgs = jnp.asarray(
        rng.integers(0, 255, (B, F, h, w)).astype(np.float32))
    flat = imgs.reshape(B * F, h, w)

    with pltpu.force_tpu_interpret_mode():
        sel = lambda im: fused_select_maps(im, 10, 31)[0]
        nested = jax.vmap(jax.vmap(sel))(imgs)
        ref = jax.vmap(sel)(flat)
        np.testing.assert_array_equal(
            np.asarray(nested).reshape(ref.shape), np.asarray(ref))

        n = 9
        ys = jnp.asarray(rng.integers(31, h - 31, (B, F, n)), jnp.int32)
        xs = jnp.asarray(rng.integers(31, w - 31, (B, F, n)), jnp.int32)
        nested = jax.vmap(jax.vmap(extract_patches_pallas))(imgs, ys, xs)
        ref = jax.vmap(extract_patches_pallas)(
            flat, ys.reshape(B * F, n), xs.reshape(B * F, n))
        np.testing.assert_array_equal(
            np.asarray(nested).reshape(ref.shape), np.asarray(ref))

        fm = lambda im: fast_margin_pallas(im, 10)[0]
        nested = jax.vmap(jax.vmap(fm))(imgs)
        ref = jax.vmap(fm)(flat)
        np.testing.assert_array_equal(
            np.asarray(nested).reshape(ref.shape), np.asarray(ref))
