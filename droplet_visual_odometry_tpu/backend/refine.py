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

from droplet_visual_odometry_tpu.backend import ba, keyframes, tracks
from droplet_visual_odometry_tpu.frontend.features import detect_and_describe


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    window: int = 8  # keyframes per BA window
    kf: keyframes.KeyframeConfig = keyframes.KeyframeConfig()
    # First two window poses fixed: they carry the marker-metric scale.
    ba: ba.BAConfig = ba.BAConfig(n_fixed=2)
    n_keypoints: int = 512
    fast_threshold: float = 20.0
    reproj_filter_px: float = 3.0
    min_views: int = 2


def refine_trajectory(
    frames: jax.Array,  # (N, H, W) float frames (undistorted)
    abs_poses: np.ndarray,  # (N, 4, 4) VO absolute poses (cTm)
    n_inliers: np.ndarray,  # (N-1,)
    K: jax.Array,
    cfg: RefineConfig = RefineConfig(),
) -> tuple[np.ndarray, dict]:
    """Smooth a VO trajectory with sliding-window BA.

    Returns (refined (N, 4, 4) absolute poses, info dict).
    """
    abs_poses = np.asarray(abs_poses, np.float64)
    kf_mask = keyframes.select_keyframes(abs_poses, np.asarray(n_inliers), cfg.kf)
    kf_idx = np.where(kf_mask)[0]
    info: dict = {"n_keyframes": len(kf_idx), "windows": 0, "rms_px": []}
    if len(kf_idx) < 3:
        return abs_poses.copy(), info

    feats = [
        detect_and_describe(
            frames[i], k=cfg.n_keypoints, threshold=cfg.fast_threshold
        )
        for i in kf_idx
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
        accept = bool(res.final_cost <= res.initial_cost) and np.isfinite(
            float(res.final_cost)
        )
        if accept:
            refined_kf[sl] = np.asarray(res.poses, np.float64)
            info["rms_px"].append(float(res.rms_px))
        info["windows"] += 1
        # Overlap the next window by the two fixed (anchor) keyframes.
        start += max(W - 2, 1)

    # Re-anchor non-keyframe poses to their preceding keyframe:
    # abs_i = (abs_i @ inv(abs_kf_old)) @ abs_kf_new for i in the segment.
    refined = abs_poses.copy()
    refined[kf_idx] = refined_kf
    for s in range(len(kf_idx)):
        k0 = kf_idx[s]
        k1 = kf_idx[s + 1] if s + 1 < len(kf_idx) else len(abs_poses)
        corr = np.linalg.inv(abs_poses[k0]) @ refined_kf[s]
        for i in range(k0 + 1, k1):
            refined[i] = abs_poses[i] @ corr
    return refined, info
