"""Fixed-budget, fully-vmapped essential-matrix RANSAC.

TPU-native re-design of the RANSAC loop inside cv::findEssentialMat
(invoked at visual_odometry.cpp:213-216 with prob=0.999, threshold=2.0 px):

  - Instead of a data-dependent sequential loop with adaptive early exit,
    a *fixed* budget of minimal samples is drawn up front and every
    hypothesis is solved and scored in parallel (vmap -> one big batched
    computation). Evaluating the full budget dominates OpenCV's adaptive
    count for any inlier ratio, so accuracy parity is one-sided in our
    favor; there is no RNG-level equivalence to preserve (SURVEY.md §7).
  - Correspondences are fixed-capacity padded arrays with validity masks;
    counts are masked reductions, never shapes.
  - Scoring is the same Sampson error OpenCV's EMEstimatorCallback uses,
    with the pixel threshold mapped to normalized coordinates via
    thr_norm = thr_px / (0.5 * (fx + fy)), as findEssentialMat does.
  - Hypothesis ranking defaults to the MSAC score (sum of residuals
    truncated at the threshold, lower = better) — the score OpenCV's USAC
    core behind cv::findEssentialMat uses (usac/quality.cpp MsacQuality).
    Plain inlier *counting* saturates on rotation-dominant pairs: when the
    camera pans, flow is nearly homographic and MANY essential matrices
    explain every correspondence within 2 px, so all hypotheses tie at
    N inliers and argmax picks an arbitrary — often multi-degree-wrong —
    winner (measured: 10-50 deg rotation spikes on a 320x240 pan scene).
    MSAC breaks those ties by residual mass and collapses the spikes.
    score="count" restores classic-RANSAC counting.

The minimal solver is pluggable: Nister 5-point (default, matching OpenCV)
or 8-point. An optional linear refit on the winning inlier set polishes E
(strictly improves accuracy; off when bit-level behavior parity with
OpenCV's no-polish RANSAC is preferred).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_vo.estimation.eight_point import estimate_essential_8pt
from tpu_vo.estimation.five_point import five_point_candidates_batched
from tpu_vo.geometry.epipolar import sampson_error
from tpu_vo.geometry.triangulation import cheirality_mask


class EssentialRansacResult(NamedTuple):
    E: jax.Array            # (3, 3) best essential matrix
    inliers: jax.Array      # (N,) bool inlier mask (includes validity)
    num_inliers: jax.Array  # () int32
    success: jax.Array      # () bool — a usable model was found
    num_hypotheses: jax.Array  # () int32 — valid candidate models scored


def _draw_samples(key: jax.Array, mask: jax.Array, n_iters: int,
                  sample_size: int) -> jax.Array:
    """(n_iters, sample_size) indices drawn uniformly from valid entries.

    Sampling is with replacement across slots; a (rare) duplicate inside a
    sample produces a degenerate hypothesis that simply scores poorly —
    the fixed budget absorbs it.
    """
    n = mask.shape[0]
    valid_idx = jnp.nonzero(mask, size=n, fill_value=0)[0]
    n_valid = jnp.maximum(jnp.sum(mask).astype(jnp.int32), 1)
    r = jax.random.randint(key, (n_iters, sample_size), 0, n_valid)
    return valid_idx[r]


def _score(E: jax.Array, x1: jax.Array, x2: jax.Array, mask: jax.Array,
           thr_sq) -> jax.Array:
    """Masked inlier mask of one hypothesis; NaN-safe."""
    err = sampson_error(E, x1, x2)
    err = jnp.where(jnp.isfinite(err), err, jnp.inf)
    return (err < thr_sq) & mask


def _quantize_ranking(loss: jax.Array, bits: int = 12) -> jax.Array:
    """Truncate a non-negative f32 ranking score to `bits` mantissa bits.

    Hypothesis generation is bit-deterministic for a given PRNG key (the
    samples, the SoA 5-point candidates, and the integer Hamming matches
    are all batch-shape-independent — verified on the CPU backend), but
    the MSAC loss is a large f32 reduction whose accumulation strategy
    XLA:CPU picks per *batch shape*: the same pair scored inside a
    width-7 vs width-8 pair batch differs by a few ulp. Near-tied
    hypotheses (rotation-dominant pairs produce whole families of them)
    then argmin to DIFFERENT winners depending on how the caller chunked
    the sequence — run_sequence_streamed vs run_sequence_batched diverged
    by whole gate flips. Truncating the mantissa to 12 bits (relative
    step 2^-12 ≈ 0.02%, far above ulp noise and far below any
    pose-meaningful loss difference) makes the ranking invariant to the
    reduction order, and argmin/top_k break the now-exact ties by lowest
    index — the same winner under every batch tiling. ±inf sentinels
    pass through unchanged (their mantissa is already zero).
    """
    i = jax.lax.bitcast_convert_type(loss.astype(jnp.float32), jnp.int32)
    keep = jnp.int32(~((1 << (23 - bits)) - 1))
    return jax.lax.bitcast_convert_type(i & keep, jnp.float32)


def _finalist_cheirality_frac(Es: jax.Array, x1s: jax.Array, x2s: jax.Array,
                              inl_sub: jax.Array, distance_thresh):
    """Fraction of a finalist's subset inliers passing cheirality under its
    best (R, t) decomposition; (F,) for (F, 3, 3) hypotheses.

    The Sampson/MSAC score is CHEIRALITY-BLIND: an essential matrix's
    twisted pair (R rotated 180 deg about t) and reflected solutions have
    the SAME epipolar residuals on every correspondence, so RANSAC can
    crown a hypothesis whose triangulated points lie almost entirely
    behind the cameras — cv::findEssentialMat has the same blind spot and
    relies on recoverPose's gate to reject the frame afterwards
    (visual_odometry.cpp:270-277), needlessly dropping to the
    rotation-only fallback. Measured on the corridor scene: near-tied
    finalist families where one member has 224/224 inliers but <10
    cheirality-valid points. Checking the prescreen subset against each
    finalist's four decompositions is ~F x 4 x |subset| fused elementwise
    ops (midpoint depths) + F small SVDs, and lets selection skip
    geometrically impossible winners up front.
    """
    from tpu_vo.estimation.recover_pose import decompose_essential

    R1, R2, t = jax.vmap(decompose_essential)(Es)
    Rs = jnp.stack([R1, R1, R2, R2], axis=1)            # (F, 4, 3, 3)
    ts = jnp.stack([t, -t, t, -t], axis=1)              # (F, 4, 3)
    F = Es.shape[0]
    x1b = jnp.broadcast_to(x1s, (F, 4) + x1s.shape)
    x2b = jnp.broadcast_to(x2s, (F, 4) + x2s.shape)
    che = cheirality_mask(Rs, ts, x1b, x2b, distance_thresh)  # (F, 4, S)
    che = che & inl_sub[:, None, :]
    counts = jnp.max(jnp.sum(che, axis=-1), axis=-1)     # (F,) best of 4
    denom = jnp.maximum(jnp.sum(inl_sub, axis=-1), 1)
    return counts.astype(jnp.float32) / denom.astype(jnp.float32)


def _score_msac(E: jax.Array, x1: jax.Array, x2: jax.Array,
                mask: jax.Array, thr_sq, score_sq):
    """(inlier mask at thr_sq, MSAC loss at score_sq) of one hypothesis.

    MSAC loss = sum over valid slots of min(sampson, score_sq) — points
    beyond the scoring threshold contribute exactly score_sq each, so the
    loss embeds inlier counting and refines it by inlier residual mass
    (usac/quality.cpp MsacQuality semantics). The loss is evaluated at
    score_sq <= thr_sq while the returned inlier mask keeps the
    reference's thr_sq definition: on rotation-dominant pairs a whole
    family of essential matrices explains every correspondence within
    2 px (flow is nearly homographic), and only the sub-threshold
    residual structure identifies the true motion. Scoring below thr is
    the batched-TPU equivalent of OpenCV USAC's iterated local
    optimization with a shrinking threshold
    (usac/local_optimization.cpp) — measured on a 320x240 pan scene it
    cuts the winning hypothesis's p90 rotation error from ~8 deg (thr
    scoring) to ~1.4 deg (thr/2) across PRNG keys, without regressing
    the well-conditioned KITTI-resolution corridor (sigma sweep in
    tools/score_variants_diag.py; too-tight sigma DOES regress it by
    overfitting upper-pyramid keypoint noise).
    """
    err = sampson_error(E, x1, x2)
    err = jnp.where(jnp.isfinite(err), err, jnp.inf)
    inl = (err < thr_sq) & mask
    loss = jnp.sum(jnp.where(mask, jnp.minimum(err, score_sq), 0.0))
    # Normalize by consensus size: mean truncated residual per inlier.
    # The raw sum slightly favors pseudo-outlier-rejecting degenerate
    # models (dropping the few parallax-carrying points from the 2 px
    # consensus REMOVES their residual mass); dividing by the count
    # restores the consensus-size pressure without the tie-saturation
    # of plain counting (measured: fixes 12-14 deg winners on planar
    # pan pairs while matching the raw loss everywhere else).
    loss = loss / jnp.maximum(jnp.sum(inl).astype(loss.dtype), 1.0)
    return inl, loss


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "use_five_point", "refit", "score",
                     "adaptive_sigma",
                     "cheirality_gate"),
)
def find_essential_ransac(
    x1: jax.Array,
    x2: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    threshold: jax.Array | float,
    max_iters: int = 256,
    use_five_point: bool = True,
    refit: bool = True,
    prescreen: int = 128,
    finalists: int = 16,
    score: str = "msac",
    score_sigma_scale: float = 0.5,
    adaptive_sigma: bool = True,
    cheirality_gate: bool = True,
    cheirality_min_frac: float = 0.25,
    distance_thresh: float = 50.0,
) -> EssentialRansacResult:
    """RANSAC essential matrix from masked normalized correspondences.

    Args:
      x1, x2: (N, 2) normalized camera coordinates (prev, curr).
      mask:   (N,) bool validity of each slot.
      key:    PRNG key for sampling.
      threshold: inlier threshold in normalized coordinates
        (pixel_threshold / (0.5*(fx+fy)) to match cv::findEssentialMat).
      max_iters: fixed number of minimal samples (all evaluated).
      use_five_point: Nister 5-point (up to 10 models/sample) vs 8-point.
      refit: polish by refitting E linearly on the winning inlier set.
      prescreen: two-phase scoring — rank ALL hypotheses on this many
        correspondences (valid-first, deterministic), then score only the
        top `finalists` on the full set. Scoring every hypothesis against
        every point was the pair stage's dominant cost (~0.5 ms/pair of
        0.9 on v5e: 2560 x 1200 Sampson evaluations); the subset ranking
        cuts it ~10x. Near-equal hypotheses may swap winner (statistical,
        inside RANSAC noise; the LO refit polishes either). 0 disables.
      finalists: hypotheses promoted to full scoring when prescreening.
      score: "msac" (default — truncated-residual ranking, matches
        OpenCV's USAC MsacQuality and is strictly better-behaved on
        rotation-dominant pairs where inlier counts saturate) or "count"
        (classic RANSAC inlier counting).
      score_sigma_scale: the MSAC loss truncates residuals at
        (score_sigma_scale * threshold)^2 while the inlier mask keeps
        `threshold` — see _score_msac for why the tighter scoring sigma
        is what disambiguates rotation-dominant pairs. 1.0 scores at the
        inlier threshold (plain MSAC).
      adaptive_sigma: data-adaptive scoring sigma (round 5). A fixed
        sigma cannot win both regimes: the tight 0.5 disambiguates
        clean rotation-dominant pairs but over-penalizes genuinely
        blur-displaced inliers (the pan+harsh deficit,
        benchmarks/pan_harsh_ablation.json), while 1.0 loses the clean
        pan discrimination. With this flag the provisional winner at
        the base sigma estimates the localization-noise scale as the
        median Sampson residual of its inliers, and the finalists are
        re-ranked at score_sq = clip(9*median, base, threshold^2) — on
        clean data the clamp keeps ranking bit-identical to the fixed
        base sigma; under 5 px motion blur it cuts the pan winner's
        rotation error from mean 2.27/max 13.1 deg (fixed 0.5) and
        0.92/12.2 (fixed 1.0) to 0.45/1.5 deg, eliminating the
        catastrophic translation tail (max 8.8 vs 84-88 deg for every
        fixed sigma; tools/score_variants_diag.py --nuisance blur).
      cheirality_gate: reject finalists whose best decomposition puts
        fewer than `cheirality_min_frac` of the prescreen-subset inliers
        in front of both cameras (see _finalist_cheirality_frac — the
        Sampson score cannot see twisted-pair/reflected solutions). Falls
        back to the plain score argmin if every finalist fails (e.g. a
        genuinely degenerate pair). Active only with two-phase scoring.
      cheirality_min_frac: the gate's subset-inlier fraction.
      distance_thresh: bounded-depth cutoff for the gate's cheirality
        test (same constant recoverPose uses, cv default 50).
    """
    if score not in ("msac", "count"):
        raise ValueError(f"unknown score method {score!r}")
    msac = score == "msac"
    dtype = x1.dtype
    thr_sq = jnp.asarray(threshold, dtype) ** 2
    score_sq = thr_sq * (score_sigma_scale ** 2)
    sample_size = 5 if use_five_point else 8

    idx = _draw_samples(key, mask, max_iters, sample_size)
    s1 = x1[idx]  # (iters, S, 2)
    s2 = x2[idx]

    if use_five_point:
        # SoA-batched solver (sample axis on TPU lanes; see five_point.py)
        Es, valid_models = five_point_candidates_batched(s1, s2)
        Es = Es.reshape(-1, 3, 3)                # (iters*10, 3, 3)
        valid_models = valid_models.reshape(-1)  # (iters*10,)
    else:
        full = jnp.ones(s1.shape[:-1], dtype=bool)
        Es = jax.vmap(estimate_essential_8pt)(s1, s2, full)
        valid_models = jnp.ones(Es.shape[0], dtype=bool)

    n = x1.shape[0]
    gate_ok = None
    sigma_adapted = False
    if prescreen and finalists and prescreen < n:
        # Phase 1: rank every hypothesis on a fixed valid-first subset.
        order = jnp.argsort(~mask)               # valid slots first
        sub = order[:prescreen]
        x1s, x2s, ms = x1[sub], x2[sub], mask[sub]
        if msac:
            sub_inl0, sub_loss = jax.vmap(
                _score_msac, in_axes=(0, None, None, None, None, None)
            )(Es, x1s, x2s, ms, thr_sq, score_sq)
            if adaptive_sigma:
                # Adapt BEFORE finalist selection: under heavy blur the
                # base-sigma subset ranking does not even surface the
                # right hypotheses into the finalists (measured: the
                # post-finalist-only variant recovered the diag's
                # full-pool win only partially). Estimate the noise
                # scale from the provisional subset winner's subset
                # inliers, then re-rank every hypothesis on the subset
                # at the adapted truncation. Clamped to [base, thr^2]:
                # clean pairs keep the base-sigma ranking bit-identical.
                prov = jnp.argmin(jnp.where(
                    valid_models, _quantize_ranking(sub_loss), jnp.inf))
                err_p = sampson_error(Es[prov], x1s, x2s)
                err_p = jnp.where(jnp.isfinite(err_p), err_p, jnp.inf)
                inl_p = sub_inl0[prov]
                srt = jnp.sort(jnp.where(inl_p, err_p, jnp.inf))
                kk = jnp.maximum(jnp.sum(inl_p).astype(jnp.int32), 1)
                med = srt[(kk - 1) // 2]
                med = jnp.where(jnp.isfinite(med), med, score_sq)
                score_sq = jnp.clip(9.0 * med, score_sq, thr_sq)
                _, sub_loss = jax.vmap(
                    _score_msac, in_axes=(0, None, None, None, None, None)
                )(Es, x1s, x2s, ms, thr_sq, score_sq)
                sigma_adapted = True
            sub_rank = jnp.where(valid_models,
                                 -_quantize_ranking(sub_loss), -jnp.inf)
        else:
            sub_inl = jax.vmap(
                _score, in_axes=(0, None, None, None, None)
            )(Es, x1s, x2s, ms, thr_sq)
            sub_rank = jnp.where(valid_models,
                                 jnp.sum(sub_inl, axis=-1), -1)
        # top_k requires k <= array size (e.g. 8-point with max_iters < 16)
        finalists = min(finalists, Es.shape[0])
        _, top = jax.lax.top_k(sub_rank, finalists)
        Es = Es[top]
        valid_models_full = valid_models
        valid_models = valid_models[top]
        if cheirality_gate:
            # Epipolar scores cannot see twisted/reflected solutions;
            # gate finalists on subset cheirality (docstring of
            # _finalist_cheirality_frac).
            inl_sub = jax.vmap(
                _score, in_axes=(0, None, None, None, None)
            )(Es, x1s, x2s, ms, thr_sq)
            frac = _finalist_cheirality_frac(Es, x1s, x2s, inl_sub,
                                             distance_thresh)
            gate_ok = valid_models & (frac >= cheirality_min_frac)
    else:
        valid_models_full = valid_models

    if msac:
        inlier_masks, losses = jax.vmap(
            _score_msac, in_axes=(0, None, None, None, None, None)
        )(Es, x1, x2, mask, thr_sq, score_sq)
        if adaptive_sigma and not sigma_adapted:
            # No-prescreen path: estimate the localization-noise scale
            # from the provisional winner at the base sigma, then
            # re-rank every hypothesis at the adapted truncation (with
            # prescreen active the adaptation already happened on the
            # subset, before finalist selection). Clamped to
            # [base, thr^2]: on clean data 9*median stays below the
            # base truncation and the ranking is bit-identical to the
            # fixed-sigma path; under heavy blur the sigma loosens
            # toward the reference's full 2 px truncation per pair.
            prov = jnp.argmin(jnp.where(valid_models,
                                        _quantize_ranking(losses), jnp.inf))
            err_prov = sampson_error(Es[prov], x1, x2)
            err_prov = jnp.where(jnp.isfinite(err_prov), err_prov, jnp.inf)
            inl_prov = inlier_masks[prov]
            srt = jnp.sort(jnp.where(inl_prov, err_prov, jnp.inf))
            k = jnp.maximum(jnp.sum(inl_prov).astype(jnp.int32), 1)
            med = srt[(k - 1) // 2]
            med = jnp.where(jnp.isfinite(med), med, score_sq)
            score_sq = jnp.clip(9.0 * med, score_sq, thr_sq)
            inlier_masks, losses = jax.vmap(
                _score_msac, in_axes=(0, None, None, None, None, None)
            )(Es, x1, x2, mask, thr_sq, score_sq)
        losses = jnp.where(valid_models, _quantize_ranking(losses), jnp.inf)
        if gate_ok is not None:
            gated = jnp.where(gate_ok, losses, jnp.inf)
            # fall back to the ungated ranking if no finalist passes
            losses = jnp.where(jnp.any(jnp.isfinite(gated)), gated, losses)
        best = jnp.argmin(losses)
        loss_best = losses[best]
        counts = jnp.sum(inlier_masks, axis=-1)
        count_best = jnp.where(valid_models[best], counts[best], -1)
    else:
        inlier_masks = jax.vmap(
            _score, in_axes=(0, None, None, None, None)
        )(Es, x1, x2, mask, thr_sq)
        counts = jnp.where(valid_models, jnp.sum(inlier_masks, axis=-1), -1)
        if gate_ok is not None:
            gated = jnp.where(gate_ok, counts, -1)
            counts = jnp.where(jnp.any(gated >= 0), gated, counts)
        best = jnp.argmax(counts)
        count_best = counts[best]

    E_best = Es[best]
    inl_best = inlier_masks[best]
    n_best = jnp.maximum(count_best, 0).astype(jnp.int32)
    success = count_best >= sample_size

    if refit:
        # Linear refit on inliers, then re-score once (a cheap LO-RANSAC
        # step). Guarded: only replaces the minimal model if it keeps or
        # improves the score (consensus size / MSAC loss).
        E_ref = estimate_essential_8pt(x1, x2, inl_best)
        if msac:
            inl_ref, loss_ref = _score_msac(E_ref, x1, x2, mask, thr_sq,
                                            score_sq)
            loss_ref = jnp.where(jnp.isfinite(loss_ref),
                                 _quantize_ranking(loss_ref), jnp.inf)
            better = (loss_ref <= loss_best) & success
        else:
            inl_ref = _score(E_ref, x1, x2, mask, thr_sq)
            better = (jnp.sum(inl_ref) >= n_best) & success
        n_ref = jnp.sum(inl_ref).astype(jnp.int32)
        E_best = jnp.where(better, E_ref, E_best)
        inl_best = jnp.where(better, inl_ref, inl_best)
        n_best = jnp.where(better, n_ref, n_best)

    return EssentialRansacResult(
        E=E_best,
        inliers=inl_best & success,
        num_inliers=jnp.where(success, n_best, 0),
        success=success,
        num_hypotheses=jnp.sum(valid_models_full).astype(jnp.int32),
    )


def pixel_threshold_to_normalized(threshold_px: float, K: jax.Array):
    """cv::findEssentialMat's threshold mapping: thr / (0.5*(fx+fy))."""
    return threshold_px / (0.5 * (K[..., 0, 0] + K[..., 1, 1]))
