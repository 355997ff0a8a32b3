"""Stage-1 ApproxTopK candidate cut (ORBConfig.stage1_exact_topk=False).

The pooled packed-map cut is the selection stage's hottest op: lax.top_k
lowers to a full sort on TPU (benchmarks/topk_micro.json). The approx
path prefilters with lax.approx_max_k and re-reads the exact int32 keys,
changing membership only at the 2n-th-score boundary. These tests pin:

  1. the keypoint set stays essentially identical to the exact cut;
  2. the routing contract (keep-ties forces the exact sorted cut).

Both need the real TPU ApproxTopK lowering, so they are TPU-gated (the
CPU fallback path in orb.py never reads the flag).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_vo.configs import ORBConfig

TPU = jax.default_backend() in ("tpu", "axon")


def _kp_set(f):
    return {(float(x), float(y), int(o))
            for (x, y), o, v in zip(np.asarray(f.xy), np.asarray(f.octave),
                                    np.asarray(f.valid)) if v}


@pytest.mark.skipif(not TPU, reason="ApproxTopK path needs a TPU")
@pytest.mark.parametrize("h,w", [(480, 640), (376, 1241)])
def test_approx_cut_keypoint_overlap(h, w, rng):
    """Exact vs approx stage-1 cut: >= 95% keypoint-set overlap (measured
    96.6-98.1% on the bench sequence; only 2n-th-score-boundary candidates
    may differ)."""
    from tpu_vo.features.orb import detect_and_compute

    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.uint8))
    fe = jax.jit(lambda im: detect_and_compute(
        im, ORBConfig(stage1_exact_topk=True)))(img)
    fa = jax.jit(lambda im: detect_and_compute(
        im, ORBConfig(stage1_exact_topk=False)))(img)
    ka, kb = _kp_set(fe), _kp_set(fa)
    jaccard = len(ka & kb) / max(len(ka | kb), 1)
    assert jaccard >= 0.95, f"exact/approx overlap {jaccard:.3f}"


@pytest.mark.skipif(not TPU, reason="ApproxTopK path needs a TPU")
def test_keep_ties_forces_exact_cut():
    """retain_best_keep_ties needs the exact sorted 2n-th value: its HLO
    must contain no ApproxTopK even with stage1_exact_topk=False, while
    the plain approx config's must."""
    from tpu_vo.features.orb import _select_level_keypoints

    img = jax.ShapeDtypeStruct((480, 640), jnp.float32)

    def hlo(cfg):
        return jax.jit(lambda im: _select_level_keypoints(
            im, 200, cfg)).lower(img).as_text()

    assert "approx" in hlo(ORBConfig(stage1_exact_topk=False)).lower()
    assert "approx" not in hlo(
        ORBConfig(stage1_exact_topk=False,
                  retain_best_keep_ties=True)).lower()
    assert "approx" not in hlo(ORBConfig(stage1_exact_topk=True)).lower()
