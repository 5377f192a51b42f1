"""Headline benchmark: VO frames/s on one chip vs the reference pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here, live, as the reference's own compute path: OpenCV ORB detect+describe on
both frames of each pair (the reference detects every frame twice,
visual_odometry_v3.py:387-392), BFMatcher(NORM_HAMMING, crossCheck),
findEssentialMat(RANSAC, prob=0.999, threshold=1.0), recoverPose, and
marker-corner triangulation — on the same synthetic frames at the reference's
1440x1080 resolution (camera_calibration.yaml:22-23). Ours is the compiled
lax.scan sequence pipeline on the default JAX device (the TPU under the
driver; falls back to CPU transparently).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


N_FRAMES = 24
WIDTH, HEIGHT = 1440, 1080


def probe_device() -> bool:
    """True if the default JAX device completes a trivial program promptly.

    Run as a SUBPROCESS with a hard timeout: a wedged TPU tunnel hangs inside
    the runtime where in-process timeouts can't reach, and the bench must
    never stall the driver — it falls back to CPU instead.
    """
    code = "import jax, jax.numpy as jnp; x = (jnp.ones((8, 8)) @ jnp.ones((8, 8))); print(float(x[0, 0]))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=240
        )
        return r.returncode == 0 and b"8.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def build_sequence():
    from droplet_visual_odometry_tpu.data import synthetic

    return synthetic.render_sequence(
        synthetic.SyntheticConfig(
            n_frames=N_FRAMES,
            width=WIDTH,
            height=HEIGHT,
            fx=1170.0,
            fy=1170.0,
            n_landmarks=900,
            landmark_size=0.07,
        )
    )


def bench_reference_cpu(seq) -> float:
    """The reference's per-pair OpenCV path, timed end-to-end (frames/s)."""
    import cv2

    K = np.asarray(seq.camera.K, np.float64)
    orb = cv2.ORB_create()  # 500 keypoints, the reference default (v3:96)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)  # v3:75

    frames = seq.frames
    corners = seq.marker_corners
    t0 = time.perf_counter()
    n_pairs = 0
    for i in range(1, len(frames)):
        prev, curr = frames[i - 1], frames[i]
        kp1, d1 = orb.detectAndCompute(prev, None)  # both frames per pair,
        kp2, d2 = orb.detectAndCompute(curr, None)  # as the reference does
        if d1 is None or d2 is None:
            continue
        matches = sorted(bf.match(d1, d2), key=lambda m: m.distance)
        if len(matches) < 8:
            continue
        p1 = np.float32([kp1[m.queryIdx].pt for m in matches])
        p2 = np.float32([kp2[m.trainIdx].pt for m in matches])
        E, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, prob=0.999, threshold=1.0)
        if E is None or E.shape != (3, 3):
            continue
        _, R, t, _ = cv2.recoverPose(E, p1, p2, K)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t])
        X = cv2.triangulatePoints(P1, P2, corners[i - 1].T.astype(np.float64), corners[i].T.astype(np.float64))
        X3 = X[:3] / X[3:]
        side = np.linalg.norm(X3[:, 0] - X3[:, 1])
        _ = seq.real_marker_length / max(side, 1e-12)
        n_pairs += 1
    dt = time.perf_counter() - t0
    return n_pairs / dt


def bench_ours(seq) -> float:
    import jax
    import jax.numpy as jnp

    from droplet_visual_odometry_tpu.estimation.vo import VOConfig, run_sequence

    frames = jnp.asarray(seq.frames, jnp.float32)
    corners = jnp.nan_to_num(jnp.asarray(seq.marker_corners))
    present = jnp.asarray(seq.marker_present)
    K = jnp.asarray(seq.camera.K, jnp.float32)
    init = jnp.asarray(seq.marker_poses[0])
    cfg = VOConfig()
    key = jax.random.PRNGKey(0)

    def run():
        return run_sequence(
            key, frames, corners, present, init, K, seq.real_marker_length, cfg
        )

    # Sync via a scalar device_get: on the tunneled TPU platform used by the
    # driver, block_until_ready can return before execution finishes (measured
    # 1000x-optimistic timings); fetching a value cannot.
    traj = run()  # compile + warmup
    _ = jax.device_get(traj.abs_poses[0, 0, 0])
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        traj = run()
    _ = jax.device_get(traj.abs_poses[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_rep
    return (len(seq) - 1) / dt


def main() -> int:
    device_ok = probe_device()
    if not device_ok:
        # Wedged/unreachable accelerator: bench on CPU rather than hang.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    seq = build_sequence()
    ref_fps = bench_reference_cpu(seq)
    ours_fps = bench_ours(seq)
    import jax

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_second_1440x1080",
                "value": round(ours_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(ours_fps / ref_fps, 2),
                "baseline_reference_cpu_fps": round(ref_fps, 2),
                "backend": jax.default_backend(),
                "device_probe_ok": device_ok,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
