"""Distributed Schur-complement BA must match single-device BA on the
8-device virtual CPU mesh (SURVEY.md §7 hard-part #2: convergence identical
under sharding, bitwise-tolerant)."""

import numpy as np

import jax.numpy as jnp

from droplet_visual_odometry_tpu.backend import ba
from droplet_visual_odometry_tpu.parallel import distributed_ba, sharding

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from test_backend import make_ba_problem  # noqa: E402


def test_distributed_matches_single_device():
    window, gt_poses, gt_pts = make_ba_problem(W=6, L=120, noise_px=0.5, seed=1)
    cfg = ba.BAConfig()

    single = ba.run_ba(window, cfg)
    mesh = sharding.make_mesh(8, axis_name="landmarks")
    multi = distributed_ba.run_ba_distributed(mesh, window, cfg)

    # Same convergence quality...
    assert float(multi.final_cost) < float(multi.initial_cost) * 0.1
    np.testing.assert_allclose(
        float(multi.final_cost), float(single.final_cost), rtol=0.05
    )
    # ...and essentially the same poses (reduction order only perturbs f32).
    np.testing.assert_allclose(
        np.asarray(multi.poses), np.asarray(single.poses), atol=2e-3
    )
    # Landmarks (ignore the padded tail).
    L = gt_pts.shape[0]
    np.testing.assert_allclose(
        np.asarray(multi.points)[:L], np.asarray(single.points), atol=2e-2
    )


def test_distributed_improves_over_init():
    window, gt_poses, _ = make_ba_problem(W=5, L=96, noise_px=0.3, pose_noise=0.03, seed=2)
    mesh = sharding.make_mesh(4, axis_name="landmarks")
    res = distributed_ba.run_ba_distributed(mesh, window, ba.BAConfig())
    est = np.asarray(res.poses)
    for w in range(len(gt_poses)):
        dt = np.linalg.norm(est[w][:3, 3] - gt_poses[w][:3, 3])
        assert dt < 0.02, (w, dt)
