"""Rotation-rich (pan-while-dolly) end-to-end accuracy.

The corridor benchmark is forward-dominant; this scene sweeps the yaw
through ±35 deg while advancing, so flow from rotation dominates flow
from translation on the steep parts — the regime where essential-matrix
estimation is near-degenerate (a family of E's explains every match at
the reference's 2 px RANSAC threshold, visual_odometry.cpp:215). The
tight-sigma MSAC scoring (estimation/ransac.py) exists for exactly this
regime; these tests pin the end-to-end behavior there.

Measured context (320x240, 12 frames, scan runner): the OpenCV reference
pipeline (utils/cv_reference.ReferenceVO) gets ATE/extent 0.083 on this
scene; with count scoring tpu_vo scattered over 0.065-0.22 across RANSAC
seeds, with normalized tight-MSAC it is 0.035-0.088.
"""

import numpy as np
import pytest

from tpu_vo.utils.metrics import ate_rmse, extent, scale_matched_gt
from tpu_vo.utils.synthetic import make_pan_sequence

W, H, T = 320, 240, 12


@pytest.fixture(scope="module")
def pan():
    return make_pan_sequence(n_frames=T, width=W, height=H, seed=3)


@pytest.mark.slow
def test_pan_sequence_accuracy(pan):
    import jax.numpy as jnp

    from tpu_vo.configs import VOConfig
    from tpu_vo.pipeline.runner import run_sequence_scan
    from tpu_vo.utils.cv_reference import ReferenceVO

    frames, Rs, ts, K = pan
    gt = scale_matched_gt(np.stack(ts))
    ext = extent(gt)
    cfg = VOConfig(image_width=W, image_height=H)
    fr = jnp.asarray(np.stack(frames))

    ates = []
    for seed in range(3):
        outs = run_sequence_scan(fr, cfg, seed=seed)
        # pipeline stays healthy: every pair after the first yields a pose
        assert int(np.asarray(outs.pose_ok).sum()) >= T - 1
        ates.append(ate_rmse(np.asarray(outs.pose.t), gt) / ext)

    # Hard pairs (side-on wall views) keep this well above corridor-level
    # accuracy, but the median must stay in the measured band.
    assert float(np.median(ates)) < 0.12, f"pan ATE/extent {ates}"

    # And we must not be worse than the OpenCV reference pipeline on its
    # own failure regime (it scores ~0.083 here, with 11+ deg rotation
    # jumps on the steepest pairs).
    ref = ReferenceVO(W, H).run(frames)
    ref_ate = ate_rmse(ref, gt) / ext
    assert float(np.median(ates)) < ref_ate * 1.5, (
        f"median {np.median(ates)} vs reference {ref_ate}"
    )
