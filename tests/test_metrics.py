"""Unit tests for trajectory metrics (ATE helpers existed since r1; RPE
added in r4 — BASELINE.json names "ATE/RPE parity" as the metric, so RPE
must be reported wherever ATE is)."""

import numpy as np

from tpu_vo.geometry import se3
from tpu_vo.utils.metrics import (
    ate_rmse,
    rpe,
    trajectory_report,
)


def _random_traj(rng, n=20, step=0.3):
    Rs = [np.eye(3)]
    ts = [np.zeros(3)]
    for _ in range(n - 1):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        dR = np.asarray(se3.rotation_from_axis_angle(ax, rng.uniform(0, 0.1)))
        d = rng.normal(size=3)
        d *= step / np.linalg.norm(d)
        Rs.append(Rs[-1] @ dR)
        ts.append(ts[-1] + Rs[-2] @ d)
    return np.stack(Rs), np.stack(ts)


def test_rpe_identical_is_zero():
    rng = np.random.default_rng(0)
    R, t = _random_traj(rng)
    out = rpe(t, t, R, R)
    assert out["rpe_trans_rmse"] == 0.0
    assert out["rpe_rot_mean_deg"] == 0.0
    assert out["rpe_trans_rel_step"] == 0.0


def test_rpe_invariant_to_global_rotation():
    """A shared global rotation offset is not per-frame error: deltas are
    expressed in each trajectory's own body frame."""
    rng = np.random.default_rng(1)
    R, t = _random_traj(rng)
    G = np.asarray(se3.rotation_from_axis_angle(
        np.array([0.0, 0.0, 1.0]), 0.7))
    R2 = np.einsum("ij,njk->nik", G, R)
    t2 = (G @ t.T).T
    out = rpe(t, t2, R, R2)
    assert out["rpe_trans_rmse"] < 1e-9
    assert out["rpe_rot_mean_deg"] < 1e-6


def test_rpe_detects_single_step_error():
    rng = np.random.default_rng(2)
    R, t = _random_traj(rng, n=11)
    t_bad = t.copy()
    t_bad[5:] += R[4] @ np.array([0.3, 0.0, 0.0])  # one corrupted step
    out = rpe(t_bad, t, R, R)
    # exactly one of 10 steps has a 0.3-magnitude error (values are
    # rounded to 4 decimals in the report)
    assert abs(out["rpe_trans_rmse"] - 0.3 / np.sqrt(10)) < 1e-4
    assert out["rpe_rot_mean_deg"] == 0.0


def test_rpe_translation_only_without_rotations():
    rng = np.random.default_rng(3)
    _, t = _random_traj(rng)
    out = rpe(t, t + 0.01)   # constant offset: deltas unchanged
    assert "rpe_rot_mean_deg" not in out
    assert out["rpe_trans_rmse"] < 1e-9


def test_trajectory_report_carries_rpe_fields():
    rng = np.random.default_rng(4)
    R, t = _random_traj(rng)
    Rg, tg = _random_traj(rng)
    rep = trajectory_report(t, ref_traj=t, gt_t=tg,
                            our_R=R, ref_R=R, gt_R=Rg)
    assert rep["rpe_trans_rmse_vs_reference"] == 0.0
    assert rep["rpe_rot_mean_deg_vs_reference"] == 0.0
    for k in ("rpe_trans_rel_step_vs_gt", "rpe_rot_mean_deg_vs_gt",
              "ref_rpe_rot_mean_deg_vs_gt", "ate_vs_reference",
              "ate_vs_gt"):
        assert k in rep, k
    assert rep["rpe_rot_mean_deg_vs_gt"] > 0.0


def test_rpe_short_trajectories():
    assert rpe(np.zeros((1, 3)), np.zeros((1, 3))) == {}
    assert ate_rmse(np.zeros((1, 3)), np.zeros((1, 3))) == 0.0


def test_photometric_nuisances_seeded_and_bounded():
    """apply_photometric_nuisances (benchmark config 6's degradation
    model): deterministic under a seed, each nuisance independently
    perturbs the frames, output stays uint8 same-shape, input untouched."""
    from tpu_vo.utils.synthetic import apply_photometric_nuisances

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (48, 64), np.uint8) for _ in range(3)]
    orig = [f.copy() for f in frames]

    a = apply_photometric_nuisances(frames, seed=7)
    b = apply_photometric_nuisances(frames, seed=7)
    c = apply_photometric_nuisances(frames, seed=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any((x != y).any() for x, y in zip(a, c)), "seed has no effect"
    for f, o in zip(frames, orig):
        np.testing.assert_array_equal(f, o)   # input list untouched

    for which in (("noise",), ("exposure",), ("blur",), ("jpeg",)):
        d = apply_photometric_nuisances(frames, seed=1, which=which)
        assert d[1].shape == frames[1].shape and d[1].dtype == np.uint8
        diff = np.abs(d[1].astype(np.int32) - frames[1].astype(np.int32))
        assert diff.mean() > 0.1, f"{which[0]} changed nothing"
        assert diff.mean() < 60, f"{which[0]} destroyed the image"
