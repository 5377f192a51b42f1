"""Integration tests: full VO pipeline on synthetic sequences with analytic GT.

These are the in-repo equivalents of BASELINE.json configs 1-2 (two-frame
relative pose; N-frame VO run with ATE), using the exact synthetic oracle
instead of the reference's recorded-bag + AR-tag workflow (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu import pipeline
from droplet_visual_odometry_tpu.core import se3
from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.vo import VOConfig
from droplet_visual_odometry_tpu.eval import tum


@pytest.fixture(scope="module")
def seq():
    return synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=30, width=640, height=480, n_landmarks=350)
    )


@pytest.fixture(scope="module")
def result(seq, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp"))
    return pipeline.run_experiment(seq, VOConfig(), out_dir=out)


class TestSequenceVO:
    def test_ate_bound(self, result):
        """~1 m trajectory must come out within a few cm (frame-to-frame VO
        with per-pair marker scale; measured ~2.5 cm, bound at 2.5x margin)."""
        assert result.ate.rmse < 0.06, result.ate

    def test_rpe_bounds(self, result):
        assert result.rpe.trans_rmse < 0.02, result.rpe
        assert result.rpe.rot_rmse_deg < 0.6, result.rpe

    def test_all_steps_ok(self, result):
        assert bool(np.all(result.trajectory.ok))
        assert int(np.median(result.trajectory.n_inliers)) > 80

    def test_scale_recovered(self, result, seq):
        """Marker-scale must map unit translations to metric ones: compare VO
        step lengths against GT step lengths."""
        gt_cam = np.linalg.inv(result.gt_abs)
        vo_cam = np.linalg.inv(result.vo_abs)
        gt_step = np.linalg.norm(np.diff(gt_cam[:, :3, 3], axis=0), axis=1)
        vo_step = np.linalg.norm(np.diff(vo_cam[:, :3, 3], axis=0), axis=1)
        ratio = vo_step / np.maximum(gt_step, 1e-9)
        assert 0.9 < np.median(ratio) < 1.1, np.percentile(ratio, [10, 50, 90])

    def test_abs_stream_is_chained_rels(self, result):
        """abs_curr = rel @ abs_prev exactly (our chaining convention)."""
        for i in range(1, len(result.vo_abs)):
            np.testing.assert_allclose(
                result.vo_abs[i],
                result.vo_rel[i - 1] @ result.vo_abs[i - 1],
                atol=1e-4,
            )

    def test_streams_written_and_parse(self, result):
        assert result.stream_paths is not None
        for name in tum.STREAM_NAMES:
            stamps, poses = tum.read_tum(result.stream_paths[name])
            assert len(stamps) >= len(result.timestamps) - 1
            assert poses.shape[1:] == (4, 4)

    def test_gt_rel_consistency(self, result):
        """GT relative = cTm_curr @ inv(cTm_prev) (dual_process:134-137)."""
        i = 5
        np.testing.assert_allclose(
            result.gt_rel[i - 1],
            result.gt_abs[i] @ np.linalg.inv(result.gt_abs[i - 1]),
            atol=1e-5,
        )

    def test_deterministic(self, seq):
        a = pipeline.run_experiment(seq, VOConfig(), seed=3)
        b = pipeline.run_experiment(seq, VOConfig(), seed=3)
        np.testing.assert_array_equal(a.vo_abs, b.vo_abs)


class TestDistortedCamera:
    """End-to-end run on a camera WITH plumb_bob distortion: the renderer
    projects through the lens model, the pipeline undistorts frames AND marker
    corners (effective_marker_corners), and accuracy must match the
    undistorted run (reference path v3:110-135)."""

    @pytest.fixture(scope="class")
    def dist_result(self):
        dseq = synthetic.render_sequence(
            synthetic.SyntheticConfig(
                n_frames=30,
                width=640,
                height=480,
                n_landmarks=350,
                distortion=np.array([-0.26, 0.07, 1e-4, -2e-4, 0.0]),
            )
        )
        return pipeline.run_experiment(dseq, VOConfig()), dseq

    def test_ate_bound_distorted(self, dist_result):
        result, _ = dist_result
        assert result.ate.rmse < 0.08, result.ate

    def test_metric_scale_under_distortion(self, dist_result):
        """The Weak-#4 failure mode: distorted corners triangulated under the
        undistorted K give a wrong metric scale. With corners undistorted the
        VO step lengths must match GT step lengths."""
        result, _ = dist_result
        gt_cam = np.linalg.inv(result.gt_abs)
        vo_cam = np.linalg.inv(result.vo_abs)
        gt_step = np.linalg.norm(np.diff(gt_cam[:, :3, 3], axis=0), axis=1)
        vo_step = np.linalg.norm(np.diff(vo_cam[:, :3, 3], axis=0), axis=1)
        ratio = vo_step / np.maximum(gt_step, 1e-9)
        assert 0.9 < np.median(ratio) < 1.1, np.percentile(ratio, [10, 50, 90])

    def test_corners_actually_distorted(self, dist_result):
        """Renderer sanity: recorded corners differ from the pinhole projection
        (i.e. the lens model is actually applied)."""
        _, dseq = dist_result
        und = pipeline.effective_marker_corners(
            dseq, pipeline.effective_K(dseq)
        )
        raw = np.asarray(dseq.marker_corners)
        ok = dseq.marker_present
        delta = np.nanmax(np.abs(und[ok] - raw[ok]))
        assert delta > 1.0, delta  # pixels


class TestMarkerAppearsLate:
    """Marker first seen at frame k>0: the trajectory must be anchored at the
    first marker-bearing frame (dual_process:170-198), not at frame 0."""

    def test_anchor_at_first_marker_frame(self, seq):
        import dataclasses as _dc

        k0 = 6
        late = _dc.replace(
            seq,
            marker_present=np.concatenate(
                [np.zeros(k0, bool), seq.marker_present[k0:]]
            ),
            marker_corners=np.concatenate(
                [np.full((k0, 4, 2), np.nan, np.float32), seq.marker_corners[k0:]]
            ),
        )
        res = pipeline.run_experiment(late, VOConfig())
        np.testing.assert_allclose(
            res.vo_abs[k0], np.asarray(seq.marker_poses[k0], np.float64), atol=1e-5
        )
        assert res.ate.rmse < 0.06, res.ate


class TestTwoFrameVO:
    @pytest.mark.parametrize(
        "n_levels,t_bound,ang_bound",
        [
            # Single-scale geometry-core precision: all 512 keypoints at level
            # 0, tightest bound (the pre-pyramid round-1 behavior).
            (1, 0.010, 0.5),
            # Default pyramid config: level 0 keeps only ~36% of the budget,
            # so single-pair precision is measurably looser — the price of
            # scale robustness (TestPyramidScaleInvariance is the payoff).
            (4, 0.020, 0.5),
        ],
    )
    def test_two_frame_relative_pose(self, seq, n_levels, t_bound, ang_bound):
        """BASELINE config #1: single-pair relative pose vs analytic GT."""
        from droplet_visual_odometry_tpu.estimation.vo import two_frame_vo
        from droplet_visual_odometry_tpu.frontend.features import detect_and_describe

        i = 10
        fa = detect_and_describe(jnp.asarray(seq.frames[i], jnp.float32), n_levels=n_levels)
        fb = detect_and_describe(jnp.asarray(seq.frames[i + 1], jnp.float32), n_levels=n_levels)
        res = two_frame_vo(
            jax.random.PRNGKey(0),
            fa,
            fb,
            jnp.asarray(seq.marker_corners[i]),
            jnp.asarray(seq.marker_corners[i + 1]),
            jnp.asarray(True),
            jnp.asarray(seq.camera.K),
            seq.real_marker_length,
            VOConfig(n_levels=n_levels),
        )
        assert bool(res.ok)
        rel_est = np.asarray(res.rel)
        cTm0 = seq.marker_poses[i].astype(np.float64)
        cTm1 = seq.marker_poses[i + 1].astype(np.float64)
        rel_gt = cTm1 @ np.linalg.inv(cTm0)
        # rotation error
        dR = rel_est[:3, :3].T @ rel_gt[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < ang_bound, ang
        # translation error (metric, after marker scaling)
        t_err = np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
        assert t_err < t_bound, (t_err, rel_est[:3, 3], rel_gt[:3, 3])

    def test_degenerate_pair_returns_identity(self, seq):
        """Too few matches (blank frame) -> identity rel, ok=False — the case
        that crashes the reference (SURVEY.md §7)."""
        from droplet_visual_odometry_tpu.estimation.vo import two_frame_vo
        from droplet_visual_odometry_tpu.frontend.features import detect_and_describe

        blank = jnp.zeros_like(jnp.asarray(seq.frames[0], jnp.float32))
        fa = detect_and_describe(jnp.asarray(seq.frames[0], jnp.float32))
        fb = detect_and_describe(blank)
        res = two_frame_vo(
            jax.random.PRNGKey(0),
            fa,
            fb,
            jnp.asarray(seq.marker_corners[0]),
            jnp.asarray(seq.marker_corners[1]),
            jnp.asarray(True),
            jnp.asarray(seq.camera.K),
            seq.real_marker_length,
            VOConfig(),
        )
        assert not bool(res.ok)
        np.testing.assert_array_equal(np.asarray(res.rel), np.eye(4, dtype=np.float32))
