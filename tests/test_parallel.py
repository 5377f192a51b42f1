"""Multi-device tests on the 8-device virtual CPU mesh: sharded results must
equal single-device results exactly (SURVEY.md §7 stage 8 requirement)."""

import numpy as np

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.vo import VOConfig
from droplet_visual_odometry_tpu.parallel import sharding


def test_mesh_has_8_devices():
    mesh = sharding.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_pair_vo_matches_single_device():
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=9, width=256, height=192, n_landmarks=300)
    )
    frames = jnp.asarray(seq.frames, jnp.float32)
    corners = jnp.nan_to_num(jnp.asarray(seq.marker_corners))
    mvalid = jnp.asarray(seq.marker_present)
    K = jnp.asarray(seq.camera.K)
    from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig

    cfg = VOConfig(
        n_keypoints=256, ransac=RansacConfig(n_hypotheses=256, lo_hypotheses=64)
    )
    key = jax.random.PRNGKey(0)

    args = (
        frames[:-1],
        frames[1:],
        corners[:-1],
        corners[1:],
        mvalid[:-1] & mvalid[1:],
        K,
    )

    single = np.asarray(sharding.pair_vo_batched(key, *args, seq.real_marker_length, cfg))

    mesh = sharding.make_mesh(8)
    multi_dev = sharding.shard_pair_vo(mesh, key, *args, seq.real_marker_length, cfg)
    multi = np.asarray(multi_dev)

    # XLA compiles the sharded program differently (fusion order), so f32
    # rounding can flip near-tied RANSAC winners; assert ACCURACY parity
    # against the analytic GT instead of bitwise equality.
    def errors(rels):
        rots, trans = [], []
        for i, rel in enumerate(rels):
            gt = seq.marker_poses[i + 1].astype(np.float64) @ np.linalg.inv(
                seq.marker_poses[i].astype(np.float64)
            )
            dR = rel[:3, :3].T @ gt[:3, :3]
            rots.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
            trans.append(np.linalg.norm(rel[:3, 3] - gt[:3, 3]))
        return np.asarray(rots), np.asarray(trans)

    rot_s, t_s = errors(single)
    rot_m, t_m = errors(multi)
    # Sanity bound only (the 256x192/256-kp budget tracks to a few degrees);
    # the PARITY deltas below are the real assertion.
    assert rot_m.max() < 8.0 and rot_s.max() < 8.0
    assert abs(rot_m.mean() - rot_s.mean()) < 1.0, (rot_s, rot_m)
    assert abs(t_m.mean() - t_s.mean()) < 0.05

    # Output really is sharded over the mesh.
    assert len(multi_dev.sharding.device_set) == 8


def test_launch_initialize_single_process_noop(monkeypatch):
    from droplet_visual_odometry_tpu.parallel import launch

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert launch.initialize() is False
    assert launch.is_coordinator()
    assert launch.global_mesh().devices.size == 8


def test_scaling_harness_pair_vo():
    """The north-star measurement harness runs end-to-end and reports sane
    numbers (efficiency is meaningless on a virtual CPU mesh with 2 physical
    cores — this validates the machinery, not the scaling)."""
    from droplet_visual_odometry_tpu.parallel import launch

    pts = launch.measure_scaling_pair_vo(
        device_counts=[1, 2], pairs_per_device=1, reps=1
    )
    assert [p.n_devices for p in pts] == [1, 2]
    assert all(p.throughput > 0 and np.isfinite(p.seconds) for p in pts)
    assert pts[0].efficiency == 1.0
    report = launch.format_report("pair_vo", pts)
    assert "eff=" in report


def test_scaling_harness_ba():
    from droplet_visual_odometry_tpu.parallel import launch

    pts = launch.measure_scaling_ba(
        device_counts=[1, 2], landmarks_per_device=32, n_poses=3, iters=2, reps=1
    )
    assert [p.n_devices for p in pts] == [1, 2]
    assert all(p.throughput > 0 for p in pts)
