"""Tests for fiducial ground-truth derivation (reference L4 parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from droplet_visual_odometry_tpu import groundtruth as gt
from droplet_visual_odometry_tpu.core import se3


def _random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_camera_T_base_matches_reference_extrinsics():
    cfg = gt.GroundTruthConfig()
    cTb = np.asarray(cfg.camera_T_base())
    # Reference constants (traj_eval_ground_truth.py:22-23).
    np.testing.assert_allclose(cTb[:3, 3], [0.0, 0.0, -0.133], atol=1e-7)
    R = cTb[:3, :3]
    # quat (0.5,-0.5,0.5,0.5) xyzw is a proper rotation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
    q_back = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
    expect = np.asarray([0.5, -0.5, 0.5, 0.5])
    assert np.allclose(q_back, expect, atol=1e-6) or np.allclose(q_back, -expect, atol=1e-6)


def test_marker_pose_to_cTm_composition():
    rng = np.random.default_rng(0)
    t = rng.normal(size=3).astype(np.float32)
    q = _random_quat(rng).astype(np.float32)
    cfg = gt.GroundTruthConfig()
    cTm = np.asarray(gt.marker_pose_to_cTm(jnp.asarray(t), jnp.asarray(q), cfg))
    bTm = np.asarray(se3.from_translation_quaternion(jnp.asarray(t), jnp.asarray(q)))
    cTb = np.asarray(cfg.camera_T_base())
    np.testing.assert_allclose(cTm, cTb @ bTm, atol=1e-6)
    # Without base_link the detection is already camera-frame (gt:147-149).
    cfg2 = gt.GroundTruthConfig(use_base_link=False)
    cTm2 = np.asarray(gt.marker_pose_to_cTm(jnp.asarray(t), jnp.asarray(q), cfg2))
    np.testing.assert_allclose(cTm2, bTm, atol=1e-6)


def _make_detections(rng, n_frames=5, m=3, ref_id=7, missing_frame=2):
    ids = rng.integers(0, 5, size=(n_frames, m)).astype(np.int32)
    ids[:, 1] = ref_id  # reference marker in slot 1 everywhere...
    ids[missing_frame, :] = -1  # ...except one empty-message frame
    t = rng.normal(size=(n_frames, m, 3)).astype(np.float32)
    q = np.stack(
        [[_random_quat(rng) for _ in range(m)] for _ in range(n_frames)]
    ).astype(np.float32)
    corners = rng.uniform(0, 640, size=(n_frames, m, 4, 2)).astype(np.float32)
    return gt.detections_from_arrays(ids, t, q, corners), ids, t, q, corners


def test_select_marker_and_derive():
    rng = np.random.default_rng(1)
    dets, ids, t, q, corners = _make_detections(rng)
    streams = gt.derive_ground_truth(dets, jnp.asarray(7))
    present = np.asarray(streams.present)
    assert present.tolist() == [True, True, False, True, True]
    # Frame 0 slot 1 is the reference marker.
    expect_cTm = np.asarray(
        gt.marker_pose_to_cTm(jnp.asarray(t[0, 1]), jnp.asarray(q[0, 1]))
    )
    np.testing.assert_allclose(np.asarray(streams.cTm)[0], expect_cTm, atol=1e-6)
    np.testing.assert_allclose(np.asarray(streams.corners)[0], corners[0, 1], atol=1e-6)


def test_reorder_corners_ccw_square():
    sq = jnp.asarray([[1.0, 0.0], [0.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    out = np.asarray(gt.reorder_corners(sq))
    # Counter-clockwise by angle around the centroid, starting in (-pi, pi].
    ang = np.arctan2(out[:, 1] - 0.5, out[:, 0] - 0.5)
    assert np.all(np.diff(ang) > 0)
    assert sorted(map(tuple, out.tolist())) == sorted(map(tuple, np.asarray(sq).tolist()))


def test_side_and_pixel_lengths():
    rng = np.random.default_rng(2)
    # Axis-aligned square of side 40 at random offset, rotated by theta.
    theta = 0.7
    R = np.asarray([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    base = np.asarray([[0, 0], [40, 0], [40, 40], [0, 40]], np.float32)
    quad = (base - 20) @ R.T + rng.uniform(100, 200, size=2)
    perm = rng.permutation(4)
    corners = jnp.asarray(quad[perm], jnp.float32)
    np.testing.assert_allclose(np.asarray(gt.side_lengths(corners)), 40.0, atol=1e-3)
    assert float(gt.marker_pixel_length(corners)) == pytest.approx(40.0, abs=1e-3)
    # Extent variant is exact only for axis-aligned markers (gt:259-277).
    axis_aligned = jnp.asarray(base + 100.0)
    assert float(gt.marker_pixel_length_extent(axis_aligned)) == pytest.approx(40.0)


def test_relative_stream_masks_missing():
    rng = np.random.default_rng(3)
    dets, *_ = _make_detections(rng)
    streams = gt.derive_ground_truth(dets, jnp.asarray(7))
    rel = np.asarray(gt.relative_stream(streams.cTm, streams.present))
    # Pairs touching the missing frame (index 2) are identity-masked.
    np.testing.assert_allclose(rel[1], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(rel[2], np.eye(4), atol=1e-6)
    # A valid pair reproduces cTm_curr @ inv(cTm_prev) (dual_process:134-137).
    cTm = np.asarray(streams.cTm, np.float64)
    np.testing.assert_allclose(rel[0], cTm[1] @ np.linalg.inv(cTm[0]), atol=1e-4)


def test_marker_keypoints_flattening():
    corners = jnp.arange(16.0).reshape(2, 4, 2)
    kp = np.asarray(gt.marker_keypoints(corners))
    assert kp.shape == (8, 2)
    np.testing.assert_allclose(kp[0], [0.0, 1.0])
