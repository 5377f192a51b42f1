"""Tests for the online (streaming) VO engine — v2 live-node parity."""

import numpy as np

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
from droplet_visual_odometry_tpu.estimation.vo import VOConfig
from droplet_visual_odometry_tpu.groundtruth import detections_from_arrays
from droplet_visual_odometry_tpu.stream import OnlineVO
from droplet_visual_odometry_tpu.core import se3
import jax.numpy as jnp

CFG = VOConfig()  # the 320x240 config is too weak for stable marker scale


def _dets_for(seq, i, ref_id=0):
    """Wrap frame i's marker into a 1-frame MarkerDetections (M=1)."""
    if not seq.marker_present[i]:
        return None
    cTm = np.asarray(seq.marker_poses[i], np.float64)
    t, q = se3.to_translation_quaternion(jnp.asarray(cTm, jnp.float32))
    return detections_from_arrays(
        np.asarray([[ref_id]], np.int32),
        np.asarray(t)[None, None],
        np.asarray(q)[None, None],
        np.asarray(seq.marker_corners[i])[None, None],
    )


def test_stream_gating_and_tracking():
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=8, width=640, height=480, n_landmarks=350)
    )
    # camera-frame detections: the synthetic marker pose is already cTm
    from droplet_visual_odometry_tpu.groundtruth import GroundTruthConfig

    vo = OnlineVO(
        K=np.asarray(seq.camera.K),
        real_marker_length=seq.real_marker_length,
        reference_id=0,
        cfg=CFG,
        gt_cfg=GroundTruthConfig(use_base_link=False),
    )

    # Frame 0 pushed WITHOUT markers: engine must stay un-armed (v2 gating).
    r0 = vo.push(seq.timestamps[0], seq.frames[0], None)
    assert not r0.armed and not vo.armed

    # Frame 0 again with its marker: arms + seeds pose from the marker.
    r1 = vo.push(seq.timestamps[0], seq.frames[0], _dets_for(seq, 0))
    assert r1.armed and vo.armed
    np.testing.assert_allclose(r1.pose, seq.marker_poses[0], atol=1e-5)
    assert r1.gt_pose is not None

    # Remaining frames: chained tracking with bounded drift vs GT.
    oks = []
    for i in range(1, len(seq)):
        r = vo.push(seq.timestamps[i], seq.frames[i], _dets_for(seq, i))
        oks.append(r.ok)
    assert np.mean(oks) > 0.6
    # Final pose close to final GT marker pose (camera positions, marker frame).
    est_cam = np.linalg.inv(vo.pose)[:3, 3]
    gt_cam = np.linalg.inv(np.asarray(seq.marker_poses[-1], np.float64))[:3, 3]
    assert np.linalg.norm(est_cam - gt_cam) < 0.25, (est_cam, gt_cam)


def test_stream_pose_callbacks():
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=3, width=160, height=120, n_landmarks=80)
    )
    from droplet_visual_odometry_tpu.groundtruth import GroundTruthConfig

    vo = OnlineVO(
        K=np.asarray(seq.camera.K),
        real_marker_length=seq.real_marker_length,
        cfg=VOConfig(n_keypoints=64, ransac=RansacConfig(n_hypotheses=64, lo_hypotheses=16)),
        gt_cfg=GroundTruthConfig(use_base_link=False),
    )
    seen = []
    vo.on_pose.append(lambda ts, pose: seen.append((ts, pose.shape)))
    vo.push(seq.timestamps[0], seq.frames[0], _dets_for(seq, 0))
    vo.push(seq.timestamps[1], seq.frames[1], _dets_for(seq, 1))
    assert len(seen) == 2 and seen[0][1] == (4, 4)


def test_on_marker_broadcast_per_id():
    """Every detected marker id is broadcast with its cTm — the
    stag_visualizer per-marker TF analog (stag_visualizer.py:13-22)."""
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=3, width=320, height=240, n_landmarks=120)
    )
    from droplet_visual_odometry_tpu.groundtruth import GroundTruthConfig

    vo = OnlineVO(
        K=np.asarray(seq.camera.K),
        real_marker_length=seq.real_marker_length,
        cfg=VOConfig(n_keypoints=64, ransac=RansacConfig(n_hypotheses=64, lo_hypotheses=16)),
        gt_cfg=GroundTruthConfig(use_base_link=False),
    )
    seen = []
    vo.on_marker.append(lambda ts, mid, cTm: seen.append((ts, mid, cTm)))

    # Two markers in one frame (ids 0 and 7), one empty slot (id -1).
    cTm = np.asarray(seq.marker_poses[0], np.float64)
    t, q = se3.to_translation_quaternion(jnp.asarray(cTm, jnp.float32))
    t3 = np.tile(np.asarray(t), (1, 3, 1))
    q3 = np.tile(np.asarray(q), (1, 3, 1))
    dets = detections_from_arrays(
        np.asarray([[0, 7, -1]], np.int32),
        t3,
        q3,
        np.tile(np.asarray(seq.marker_corners[0])[None, None], (1, 3, 1, 1)),
    )
    vo.push(seq.timestamps[0], seq.frames[0], dets)
    assert [mid for _, mid, _ in seen] == [0, 7]
    for _, _, pose in seen:
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(pose, cTm, atol=1e-5)


def test_host_marker_info_matches_device_path():
    """OnlineVO._marker_info is a host-numpy mirror of the jitted GT path
    (select_marker + marker_pose_to_cTm) — assert exact agreement, including
    the missing-id and use_base_link branches."""
    from droplet_visual_odometry_tpu.groundtruth import (
        GroundTruthConfig,
        derive_ground_truth,
        detections_from_arrays,
    )

    rng = np.random.default_rng(3)
    ids = np.asarray([[7, 3]], np.int32)
    t = rng.normal(size=(1, 2, 3)).astype(np.float32)
    q = rng.normal(size=(1, 2, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    corners = rng.uniform(0, 100, (1, 2, 4, 2)).astype(np.float32)
    dets = detections_from_arrays(ids, t, q, corners)

    for use_base in (True, False):
        cfg = GroundTruthConfig(use_base_link=use_base)
        vo = OnlineVO(K=np.eye(3), real_marker_length=0.2, reference_id=3,
                      cfg=CFG, gt_cfg=cfg)
        cTm, c, ok = vo._marker_info(dets)
        assert ok
        streams = derive_ground_truth(dets, jnp.asarray(3), cfg)
        np.testing.assert_allclose(cTm, np.asarray(streams.cTm[0]), atol=1e-6)
        np.testing.assert_array_equal(c, np.asarray(streams.corners[0]))

    vo = OnlineVO(K=np.eye(3), real_marker_length=0.2, reference_id=9, cfg=CFG)
    cTm, _, ok = vo._marker_info(dets)
    assert cTm is None and not ok
