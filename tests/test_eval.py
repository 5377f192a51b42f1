"""Tests for TUM I/O and trajectory metrics."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from droplet_visual_odometry_tpu.core import se3
from droplet_visual_odometry_tpu.eval import metrics, tum


def random_traj(n=20, seed=0):
    rng = np.random.default_rng(seed)
    R = Rotation.random(n, random_state=seed).as_matrix()
    t = np.cumsum(rng.normal(scale=0.1, size=(n, 3)), axis=0)
    return np.asarray(se3.make_se3(jnp.asarray(R), jnp.asarray(t)))


class TestTum:
    def test_roundtrip(self, tmp_path):
        poses = random_traj(16)
        ts = np.arange(16) * 0.05
        p = str(tmp_path / "traj.txt")
        tum.write_tum(p, ts, poses)
        ts2, poses2 = tum.read_tum(p)
        np.testing.assert_allclose(ts2, ts, atol=1e-12)
        np.testing.assert_allclose(poses2, poses, atol=1e-5)

    def test_line_format_parity(self, tmp_path):
        """Line = 't tx ty tz qx qy qz qw' (pose_estimation_module.py:80-86)."""
        T = np.eye(4)
        T[:3, 3] = [1, 2, 3]
        p = str(tmp_path / "t.txt")
        tum.write_tum(p, [7.25], T[None])
        parts = open(p).read().split()
        assert len(parts) == 8
        assert float(parts[0]) == 7.25
        assert [float(x) for x in parts[1:4]] == [1, 2, 3]
        np.testing.assert_allclose([float(x) for x in parts[4:8]], [0, 0, 0, 1], atol=1e-7)

    def test_six_streams(self, tmp_path):
        n = 10
        ts = np.arange(n) * 0.1
        gt = random_traj(n, 1)
        vo = random_traj(n, 2)
        gt_rel = np.asarray(se3.gt_relative(jnp.asarray(gt[:-1]), jnp.asarray(gt[1:])))
        vo_rel = np.asarray(se3.gt_relative(jnp.asarray(vo[:-1]), jnp.asarray(vo[1:])))
        paths = tum.write_experiment_streams(str(tmp_path), ts, gt, gt_rel, vo, vo_rel)
        assert set(paths) == set(tum.STREAM_NAMES)
        for name, p in paths.items():
            data = np.loadtxt(p, ndmin=2)
            expect = n if "absolute" in name else n - 1
            assert data.shape == (expect, 8), name


class TestMetrics:
    def test_ate_zero_for_identical(self):
        tr = random_traj(30)
        res = metrics.ate(tr, tr)
        assert res.rmse == 0.0

    def test_ate_known_offset(self):
        tr = random_traj(30)
        tr2 = tr.copy()
        tr2[:, 0, 3] += 0.5
        res = metrics.ate(tr, tr2)
        np.testing.assert_allclose(res.rmse, 0.5, atol=1e-6)

    def test_ate_se3_alignment_removes_rigid_offset(self):
        tr = random_traj(30)
        R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
        T = np.asarray(se3.make_se3(jnp.asarray(R), jnp.asarray([1.0, -2, 0.5])))
        tr2 = np.einsum("ij,njk->nik", T, tr)
        assert metrics.ate(tr, tr2).rmse > 0.5
        assert metrics.ate(tr, tr2, align="se3").rmse < 1e-5

    def test_ate_sim3_alignment_removes_scale(self):
        tr = random_traj(30)
        tr2 = tr.copy()
        tr2[:, :3, 3] *= 1.7
        assert metrics.ate(tr, tr2, align="sim3").rmse < 1e-5

    def test_rpe_zero_and_sensitivity(self):
        tr = random_traj(30)
        res = metrics.rpe(tr, tr)
        assert res.trans_rmse < 1e-6 and res.rot_rmse_deg < 1e-3
        tr2 = tr.copy()
        tr2[5, :3, 3] += 0.1  # one bad pose -> two bad relative steps
        res2 = metrics.rpe(tr, tr2)
        assert res2.trans_rmse > 0.01

    def test_per_axis_stats_shapes(self):
        st = metrics.per_axis_stats(random_traj(30))
        for k in ("translation_std", "translation_mean", "euler_std", "euler_mean"):
            assert st[k].shape == (3,)


def test_gt_vo_difference_parity():
    """PEM:113-164 parity: per-frame translation/euler deltas + euclidean."""
    import numpy as np

    from droplet_visual_odometry_tpu.eval import metrics

    rng = np.random.default_rng(7)
    gt = np.tile(np.eye(4), (5, 1, 1))
    vo = gt.copy()
    vo[:, :3, 3] = rng.normal(size=(5, 3))
    d = metrics.gt_vo_difference(gt, vo)
    np.testing.assert_allclose(d["translation_diff"], -vo[:, :3, 3])
    np.testing.assert_allclose(d["euclidean"], np.linalg.norm(vo[:, :3, 3], axis=1))
    np.testing.assert_allclose(d["euler_diff"], 0.0, atol=1e-6)
    # Rotation deltas wrap into (-pi, pi].
    from droplet_visual_odometry_tpu.core import se3
    import jax.numpy as jnp

    Rz = np.asarray(se3.euler_to_rotmat(jnp.asarray([0.0, 0.0, 3.0])))
    vo2 = gt.copy()
    vo2[:, :3, :3] = Rz
    d2 = metrics.gt_vo_difference(gt, vo2)
    np.testing.assert_allclose(d2["euler_diff"][:, 2], -3.0, atol=1e-5)


class TestDebugImagery:
    """Match/keypoint/marker-corner debug imagery (v3:174-187, 242-260,
    370-379 parity)."""

    def test_dump_match_images_writes_pngs(self, tmp_path):
        from droplet_visual_odometry_tpu import pipeline
        from droplet_visual_odometry_tpu.data import synthetic
        from droplet_visual_odometry_tpu.estimation.vo import VOConfig

        from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig

        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(n_frames=4, width=320, height=240, n_landmarks=200)
        )
        cfg = VOConfig(
            n_keypoints=128,
            n_levels=2,
            ransac=RansacConfig(n_hypotheses=128, lo_hypotheses=32),
        )
        paths = pipeline.dump_match_images(seq, cfg, str(tmp_path), n_pairs=2)
        import os

        assert len(paths) >= 3  # 2 match images + keypoint overlay (+ corners)
        names = {os.path.basename(p) for p in paths}
        assert any(n.startswith("match_") for n in names)
        assert any(n.startswith("keypoints_") for n in names)
        for p in paths:
            assert os.path.getsize(p) > 1000  # a real PNG, not an empty file

    def test_plot_matches_inlier_split(self, tmp_path):
        import numpy as np

        from droplet_visual_odometry_tpu.eval import plots

        rng = np.random.default_rng(0)
        fa = rng.random((60, 80)).astype(np.float32)
        fb = rng.random((60, 80)).astype(np.float32)
        k = 16
        xy_a = rng.random((k, 2)) * [80, 60]
        xy_b = rng.random((k, 2)) * [80, 60]
        idx = rng.integers(0, k, size=k)
        valid = np.ones(k, bool)
        inl = rng.random(k) > 0.5
        out = tmp_path / "m.png"
        plots.plot_matches(str(out), fa, fb, xy_a, xy_b, idx, valid, inliers=inl)
        assert out.stat().st_size > 1000
