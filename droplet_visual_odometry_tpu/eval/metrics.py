"""Trajectory evaluation: ATE / RPE and the reference's per-axis statistics.

The reference computes per-axis std/mean of translations and euler angles
(traj_evaluation_data_analysis.py:39-69) and leaves ATE to external TUM
tooling; here ATE/RPE are first-class (BASELINE.md targets ATE RMSE parity).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from droplet_visual_odometry_tpu.core import se3


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = False
) -> tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity/rigid alignment src -> dst ((N, 3) each).

    Returns (R, t, s) minimising ||dst - (s R src + t)||^2 (Umeyama 1991).
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


class ATEResult(NamedTuple):
    rmse: float
    mean: float
    median: float
    max: float
    errors: np.ndarray  # (N,) per-frame translation errors


def ate(
    gt_poses: np.ndarray,
    est_poses: np.ndarray,
    align: str = "none",  # 'none' | 'se3' | 'sim3'
) -> ATEResult:
    """Absolute trajectory error between (N, 4, 4) pose streams.

    'none' compares raw translations (the reference's implicit convention —
    both streams share the first-marker frame); 'se3'/'sim3' applies Umeyama
    alignment first (the rpg_trajectory_evaluation convention).
    """
    gt_t = np.asarray(gt_poses, np.float64)[:, :3, 3]
    es_t = np.asarray(est_poses, np.float64)[:, :3, 3]
    if align != "none":
        R, t, s = umeyama_alignment(es_t, gt_t, with_scale=(align == "sim3"))
        es_t = (s * (R @ es_t.T)).T + t
    err = np.linalg.norm(gt_t - es_t, axis=1)
    return ATEResult(
        rmse=float(np.sqrt((err**2).mean())),
        mean=float(err.mean()),
        median=float(np.median(err)),
        max=float(err.max()),
        errors=err,
    )


class RPEResult(NamedTuple):
    trans_rmse: float
    rot_rmse_deg: float
    trans_errors: np.ndarray
    rot_errors_deg: np.ndarray


def rpe(gt_poses: np.ndarray, est_poses: np.ndarray, delta: int = 1) -> RPEResult:
    """Relative pose error at frame spacing `delta` between (N, 4, 4) streams."""
    gt = jnp.asarray(gt_poses)
    es = jnp.asarray(est_poses)
    gt_rel = se3.inverse(gt[:-delta]) @ gt[delta:]
    es_rel = se3.inverse(es[:-delta]) @ es[delta:]
    err = se3.inverse(gt_rel) @ es_rel
    t_err = np.asarray(jnp.linalg.norm(se3.translation(err), axis=-1))
    w = np.asarray(se3.so3_log(se3.rotation(err)))
    r_err = np.degrees(np.linalg.norm(w, axis=-1))
    return RPEResult(
        trans_rmse=float(np.sqrt((t_err**2).mean())),
        rot_rmse_deg=float(np.sqrt((r_err**2).mean())),
        trans_errors=t_err,
        rot_errors_deg=r_err,
    )


def per_axis_stats(poses: np.ndarray, axes: str = "sxyz") -> dict[str, np.ndarray]:
    """Reference parity: per-axis std/mean of translations and euler angles
    (traj_evaluation_data_analysis.py:39-69)."""
    P = jnp.asarray(poses)
    t = np.asarray(se3.translation(P))
    e = np.asarray(se3.rotmat_to_euler(se3.rotation(P), axes=axes))
    return {
        "translation_std": t.std(axis=0),
        "translation_mean": t.mean(axis=0),
        "euler_std": e.std(axis=0),
        "euler_mean": e.mean(axis=0),
    }


def gt_vo_difference(gt_poses: np.ndarray, vo_poses: np.ndarray) -> dict[str, np.ndarray]:
    """Per-frame GT-vs-VO deltas — pose_estimation_module parity.

    Returns:
      translation_diff: (N, 3) gt_t - vo_t     (PEM get_gt_vo_difference, :113-147)
      euler_diff:       (N, 3) gt_euler - vo_euler (sxyz)
      euclidean:        (N,)   ||gt_t - vo_t||  (compute_gt_vo_translation_difference,
                               PEM:156-164; back_up_files/calculations.py:4-6)
    """
    gt_poses = np.asarray(gt_poses, np.float64)
    vo_poses = np.asarray(vo_poses, np.float64)
    assert gt_poses.shape == vo_poses.shape and gt_poses.shape[1:] == (4, 4)
    t_diff = gt_poses[:, :3, 3] - vo_poses[:, :3, 3]
    gt_euler = np.asarray(
        jnp.stack([se3.rotmat_to_euler(jnp.asarray(T[:3, :3], jnp.float32)) for T in gt_poses])
    )
    vo_euler = np.asarray(
        jnp.stack([se3.rotmat_to_euler(jnp.asarray(T[:3, :3], jnp.float32)) for T in vo_poses])
    )
    e_diff = gt_euler - vo_euler
    # Wrap angle deltas into (-pi, pi].
    e_diff = (e_diff + np.pi) % (2.0 * np.pi) - np.pi
    return {
        "translation_diff": t_diff,
        "euler_diff": e_diff,
        "euclidean": np.linalg.norm(t_diff, axis=1),
    }
