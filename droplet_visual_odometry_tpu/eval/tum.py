"""TUM-format trajectory I/O — byte-level parity with the reference's logs.

The reference writes 'stamped' trajectory files with lines
"t tx ty tz qx qy qz qw" (pose_estimation_module.py:80-86) in six streams per
experiment: {ground_truth, traj_estimate} x {absolute, relative, velocity}
(trajectory_evaluation_dual_process.py:256-290, file names at :296-309), a
format consumable by rpg_trajectory_evaluation / evo. This module reproduces
that contract exactly so reference tooling can evaluate our trajectories.
"""

from __future__ import annotations

import os

import numpy as np

from droplet_visual_odometry_tpu.core import se3

import jax.numpy as jnp

# The six canonical file names (trajectory_evaluation_dual_process.py:296-309).
STREAM_NAMES = (
    "stamped_ground_truth_absolute.txt",
    "stamped_ground_truth_relative.txt",
    "stamped_ground_truth_velocity.txt",
    "stamped_traj_estimate_absolute.txt",
    "stamped_traj_estimate_relative.txt",
    "stamped_traj_estimate_velocity.txt",
)


def write_tum(path: str, timestamps: np.ndarray, poses: np.ndarray) -> None:
    """Write (N,) stamps + (N, 4, 4) poses as TUM lines (append-free truncate,
    matching clear_txt_file_contents-then-append, pose_estimation_module.py:80-91)."""
    poses = np.asarray(poses, np.float64)
    t, q = se3.to_translation_quaternion(jnp.asarray(poses))
    t, q = np.asarray(t), np.asarray(q)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(len(timestamps)):
            f.write(
                "%r %r %r %r %r %r %r %r\n"
                % (
                    float(timestamps[i]),
                    float(t[i, 0]), float(t[i, 1]), float(t[i, 2]),
                    float(q[i, 0]), float(q[i, 1]), float(q[i, 2]), float(q[i, 3]),
                )
            )


def read_tum(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a TUM file -> ((N,) stamps, (N, 4, 4) poses)."""
    data = np.loadtxt(path, ndmin=2)
    stamps = data[:, 0]
    t = data[:, 1:4]
    q = data[:, 4:8]
    poses = np.asarray(se3.from_translation_quaternion(jnp.asarray(t), jnp.asarray(q)))
    return stamps, poses


def velocity_stream(timestamps: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """Finite-difference velocity 4x4 stream (N-1, 4, 4) — reference
    get_velocity_between_timestamps semantics (pose_estimation_module.py:94-111,
    including its element-wise rotation rate; see core.se3)."""
    prev = jnp.asarray(poses[:-1])
    curr = jnp.asarray(poses[1:])
    return np.asarray(
        se3.velocity_between_timestamps(
            prev, curr, jnp.asarray(timestamps[:-1]), jnp.asarray(timestamps[1:])
        )
    )


def write_experiment_streams(
    out_dir: str,
    timestamps: np.ndarray,
    gt_abs: np.ndarray,
    gt_rel: np.ndarray,
    vo_abs: np.ndarray,
    vo_rel: np.ndarray,
) -> dict[str, str]:
    """Write the six canonical streams. abs arrays are (N, 4, 4); rel arrays
    (N-1, 4, 4) stamped with the *current* frame's time like the reference's
    per-pair appends (dual_process:209-252). Velocities are derived from the
    absolute streams. Returns {stream_name: path}."""
    ts = np.asarray(timestamps)
    paths = {}
    payload = {
        "stamped_ground_truth_absolute.txt": (ts, gt_abs),
        "stamped_ground_truth_relative.txt": (ts[1:], gt_rel),
        "stamped_ground_truth_velocity.txt": (ts[1:], velocity_stream(ts, gt_abs)),
        "stamped_traj_estimate_absolute.txt": (ts, vo_abs),
        "stamped_traj_estimate_relative.txt": (ts[1:], vo_rel),
        "stamped_traj_estimate_velocity.txt": (ts[1:], velocity_stream(ts, vo_abs)),
    }
    for name, (t_arr, p_arr) in payload.items():
        p = os.path.join(out_dir, name)
        write_tum(p, t_arr, p_arr)
        paths[name] = p
    return paths
