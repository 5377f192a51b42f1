"""25,075-frame streaming soak — the reference's OWN sequence scale.

The reference processes 25,075-frame bags (visual_odometry_v3.py:20). This
soak proves the streaming engine handles that scale with bounded memory:
frames live in an on-disk uint8 np.memmap, `run_sequence_checkpointed`
streams them host->device chunk by chunk, a simulated crash interrupts the
run mid-way, and the resume completes from the persisted state — while peak
RSS growth stays far below what whole-sequence f32 residency would cost
(~1.2 GB at this resolution; ~150 GB at the bag's 1440x1080).

Soak-class: opt in with `pytest --runslow` (~5 min on the CPU mesh).
"""

import resource

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
from droplet_visual_odometry_tpu.estimation.vo import VOConfig
from droplet_visual_odometry_tpu.utils import checkpoint

N_FRAMES = 25_075  # visual_odometry_v3.py:20
H, W = 96, 128
CHUNK = 512


def _pingpong(n_base: int, n_total: int) -> np.ndarray:
    """0..n-1, n-2..0, 1..n-1, ... — every adjacent pair is a genuine small
    motion (no teleport at tile boundaries)."""
    period = 2 * (n_base - 1)
    t = np.arange(n_total) % period
    return np.minimum(t, period - t).astype(np.int64)


@pytest.mark.slow
def test_25k_frame_streaming_resume_bounded_memory(tmp_path):
    # Intrinsics scaled to the reduced resolution (fx=110 ~ the default
    # 640-px fx=520 FOV) and landmarks large enough to survive it — at the
    # default fx the 128-px frame sees a 14-degree slice of the wall and the
    # frontend starves (3-5 matches/pair).
    base = synthetic.render_sequence(
        synthetic.SyntheticConfig(
            n_frames=500,
            width=W,
            height=H,
            fx=110.0,
            fy=110.0,
            n_landmarks=250,
            landmark_size=0.12,
            noise_std=1.0,
        )
    )
    idx = _pingpong(500, N_FRAMES)

    # Frames on DISK (uint8 memmap), written in slabs — the raw-store shape
    # of the streaming contract (an ndarray never holds the full sequence).
    frames = np.lib.format.open_memmap(
        str(tmp_path / "frames.npy"), mode="w+", dtype=np.uint8, shape=(N_FRAMES, H, W)
    )
    for s in range(0, N_FRAMES, 4096):
        e = min(s + 4096, N_FRAMES)
        frames[s:e] = base.frames[idx[s:e]]
    frames.flush()

    corners = np.nan_to_num(base.marker_corners)[idx]
    present = base.marker_present[idx]
    cfg = VOConfig(
        n_keypoints=64,
        n_levels=2,
        fast_threshold=10.0,
        ransac=RansacConfig(n_hypotheses=64, lo_hypotheses=16),
        scale_mode="hold",
    )
    K = np.asarray(base.camera.K, np.float32)
    ckpt = str(tmp_path / "soak_ckpt.npz")

    calls = {"n": 0}

    def preprocess_crashing(chunk_arr):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated crash mid-run")
        return jnp.asarray(np.asarray(chunk_arr), jnp.float32)

    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.run_sequence_checkpointed(
            jax.random.PRNGKey(0),
            frames,
            corners,
            present,
            np.eye(4, dtype=np.float32),
            K,
            base.real_marker_length,
            cfg,
            path=ckpt,
            chunk=CHUNK,
            preprocess=preprocess_crashing,
        )

    # 3 chunks completed and persisted before the crash.
    state = checkpoint.load_state(ckpt)
    assert state is not None
    assert int(state["next_start"]) == 1 + 3 * CHUNK

    calls2 = {"n": 0}
    # RSS high-water AFTER setup + compile + the 3-chunk crash run: the
    # resumed run streams the remaining 94% of the sequence and must not
    # move the peak materially — that is the bounded-memory claim. (Render
    # copies, memmap dirty pages and XLA compile arenas all peak before
    # this point.)
    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    def preprocess_counting(chunk_arr):
        calls2["n"] += 1
        return jnp.asarray(np.asarray(chunk_arr), jnp.float32)

    traj = checkpoint.run_sequence_checkpointed(
        jax.random.PRNGKey(0),
        frames,
        corners,
        present,
        np.eye(4, dtype=np.float32),
        K,
        base.real_marker_length,
        cfg,
        path=ckpt,
        chunk=CHUNK,
        preprocess=preprocess_counting,
    )

    # The resume processed ONLY the remaining chunks, not the whole sequence.
    n_chunks_total = -(-(N_FRAMES - 1) // CHUNK)
    assert calls2["n"] == n_chunks_total - 3

    assert traj.abs_poses.shape == (N_FRAMES, 4, 4)
    assert traj.rel_poses.shape == (N_FRAMES - 1, 4, 4)
    assert np.isfinite(traj.abs_poses).all()
    assert np.isfinite(traj.rel_poses).all()
    # The ping-pong motion is trackable: the overwhelming majority of pairs
    # estimate a pose (direction reversals may drop a few).
    assert np.asarray(traj.ok).mean() > 0.95

    # Bounded memory: streaming 46 more chunks (94% of the 25k sequence)
    # must not push the peak beyond chunk-scale headroom. Whole-sequence f32
    # residency alone would add ~1.23 GB on top of the already-reached peak
    # (and the batched frontend's temporaries would multiply that ~25x).
    rss_after_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss_after_kb - rss_before_kb) / 1024.0
    full_residency_mb = N_FRAMES * H * W * 4 / 1e6
    assert growth_mb < 0.5 * full_residency_mb, (growth_mb, full_residency_mb)
