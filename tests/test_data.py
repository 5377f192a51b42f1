"""Tests for the sequence format, pairing semantics, and synthetic renderer."""

import numpy as np

from droplet_visual_odometry_tpu.core import se3
from droplet_visual_odometry_tpu.data import sequence as seq_mod
from droplet_visual_odometry_tpu.data import synthetic

import jax.numpy as jnp


class TestPairing:
    def test_exact_intersection_sorted(self):
        """Mirrors get_valid_message_stream.py:39-53 pairing semantics."""
        img = [3.0, 1.0, 2.0, 5.0]
        mrk = [2.0, 3.0, 4.0, 7.0]
        out = seq_mod.pair_timestamps(img, mrk)
        np.testing.assert_array_equal(out, [2.0, 3.0])

    def test_build_paired_sequence_drops_empty_markers(self):
        rng = np.random.default_rng(0)
        img_stamps = np.array([0.0, 0.1, 0.2, 0.3])
        frames = rng.integers(0, 255, size=(4, 8, 8), dtype=np.uint8)
        mrk_stamps = np.array([0.1, 0.2, 0.3])
        corners = rng.uniform(size=(3, 4, 2)).astype(np.float32)
        poses = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4)).copy()
        ids = np.array([0, -1, 0], np.int32)  # middle one = empty marker msg
        cam = synthetic.make_camera(500, 500, 4, 4, None, 8, 8)
        s = seq_mod.build_paired_sequence(
            img_stamps, frames, mrk_stamps, corners, poses, ids, cam, 0.2
        )
        np.testing.assert_array_equal(s.timestamps, [0.1, 0.3])
        np.testing.assert_array_equal(s.frames, frames[[1, 3]])
        np.testing.assert_array_equal(s.marker_ids, [0, 0])

    def test_roundtrip_save_load(self, tmp_path):
        s = synthetic.render_sequence(synthetic.SyntheticConfig(n_frames=4, width=64, height=48, n_landmarks=20))
        p = str(tmp_path / "seq.npz")
        seq_mod.save(p, s)
        s2 = seq_mod.load(p)
        np.testing.assert_array_equal(s.frames, s2.frames)
        np.testing.assert_allclose(s.marker_corners, s2.marker_corners, atol=0)
        np.testing.assert_allclose(np.asarray(s.camera.K), np.asarray(s2.camera.K), atol=1e-6)
        assert s2.real_marker_length == s.real_marker_length
        np.testing.assert_allclose(s.gt_poses, s2.gt_poses, atol=0)


class TestSynthetic:
    def test_shapes_and_determinism(self):
        cfg = synthetic.SyntheticConfig(n_frames=6, width=160, height=120, n_landmarks=50)
        a = synthetic.render_sequence(cfg)
        b = synthetic.render_sequence(cfg)
        np.testing.assert_array_equal(a.frames, b.frames)
        assert a.frames.shape == (6, 120, 160)
        assert a.marker_present.any()

    def test_marker_corners_match_analytic_projection(self):
        cfg = synthetic.SyntheticConfig(n_frames=5, width=320, height=240, n_landmarks=0)
        s = synthetic.render_sequence(cfg)
        K = np.asarray(s.camera.K, np.float64)
        corners_w = synthetic.marker_world_corners(cfg.marker_length)
        for i in range(len(s)):
            if not s.marker_present[i]:
                continue
            cTw = np.linalg.inv(s.gt_poses[i].astype(np.float64))
            pc = corners_w @ cTw[:3, :3].T + cTw[:3, 3]
            uv = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            np.testing.assert_allclose(s.marker_corners[i], uv, atol=1e-3)

    def test_marker_pose_consistent_with_gt(self):
        """cTm from the 'detector' channel == inv(wTc) (marker frame == world)."""
        s = synthetic.render_sequence(synthetic.SyntheticConfig(n_frames=5, width=160, height=120, n_landmarks=0))
        for i in range(len(s)):
            if not s.marker_present[i]:
                continue
            np.testing.assert_allclose(
                s.marker_poses[i],
                np.linalg.inv(s.gt_poses[i].astype(np.float64)).astype(np.float32),
                atol=1e-5,
            )

    def test_gt_relative_convention(self):
        """rel = cTm_curr @ inv(cTm_prev) maps prev-camera coords to curr-camera
        coords — validated against point projection."""
        s = synthetic.render_sequence(synthetic.SyntheticConfig(n_frames=3, width=160, height=120, n_landmarks=0))
        cTm0 = jnp.asarray(s.marker_poses[0])
        cTm1 = jnp.asarray(s.marker_poses[1])
        rel = np.asarray(se3.gt_relative(cTm0, cTm1))
        p_w = np.array([0.05, -0.02, 0.3, 1.0])
        p_c0 = np.linalg.inv(s.gt_poses[0].astype(np.float64)) @ p_w
        p_c1 = np.linalg.inv(s.gt_poses[1].astype(np.float64)) @ p_w
        np.testing.assert_allclose(rel @ p_c0, p_c1, atol=1e-4)

    def test_frames_have_texture(self):
        s = synthetic.render_sequence(synthetic.SyntheticConfig(n_frames=2, width=320, height=240))
        # Should have enough contrast structure for a corner detector.
        assert s.frames[0].std() > 20
        grad = np.abs(np.diff(s.frames[0].astype(np.int32), axis=1))
        assert (grad > 50).sum() > 200  # plenty of strong edges
