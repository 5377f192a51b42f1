"""Tests for utils: config YAML round-trip, profiling, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
from droplet_visual_odometry_tpu.estimation.vo import VOConfig
from droplet_visual_odometry_tpu.utils import checkpoint, config, profiling


def test_config_yaml_roundtrip(tmp_path):
    cfg = config.ExperimentConfig(
        sequence="seq.npz",
        marker_id=3,
        real_marker_length=0.15,
        backend="ba",
        vo=VOConfig(n_keypoints=128, ransac=RansacConfig(n_hypotheses=256)),
    )
    p = tmp_path / "exp.yaml"
    config.save(str(p), cfg)
    back = config.load(str(p))
    assert back == cfg
    assert back.vo.ransac.n_hypotheses == 256


def test_config_unknown_key_fails():
    with pytest.raises(KeyError, match="unknown"):
        config.from_yaml("sequence: a\nnot_a_field: 1\n")


def test_stage_timer_accumulates():
    times = profiling.StageTimes()
    with times.stage("a", sync=False):
        pass
    with times.stage("a", sync=False):
        pass
    rep = times.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["total_s"] >= 0
    assert "a" in times.pretty()


def test_timed_syncs_result():
    out, secs = profiling.timed(lambda x: x * 2, jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert secs >= 0


def _tiny_sequence(n=7):
    return synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=n, width=96, height=72, n_landmarks=50)
    )


def _ckpt_args(seq):
    corners = np.nan_to_num(np.asarray(seq.marker_corners))
    return (
        np.asarray(seq.frames, np.float32),
        corners,
        np.asarray(seq.marker_present),
        np.asarray(seq.marker_poses[0]),
        np.asarray(seq.camera.K, np.float32),
        seq.real_marker_length,
    )


CFG = VOConfig(n_keypoints=64, ransac=RansacConfig(n_hypotheses=64, lo_hypotheses=16))


def test_checkpoint_resume_bitwise(tmp_path):
    seq = _tiny_sequence()
    frames, corners, present, init, K, L = _ckpt_args(seq)
    key = jax.random.PRNGKey(0)
    p_full = str(tmp_path / "full.npz")
    full = checkpoint.run_sequence_checkpointed(
        key, frames, corners, present, init, K, L, CFG, path=p_full, chunk=3
    )
    assert full.abs_poses.shape == (len(seq), 4, 4)

    # Interrupt after the first chunk, then resume: identical result.
    p_int = str(tmp_path / "int.npz")
    orig_save = checkpoint.save_state
    calls = {"n": 0}

    def bomb(path, state):
        orig_save(path, state)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    checkpoint.save_state, saved = bomb, checkpoint.save_state
    try:
        with pytest.raises(KeyboardInterrupt):
            checkpoint.run_sequence_checkpointed(
                key, frames, corners, present, init, K, L, CFG, path=p_int, chunk=3
            )
    finally:
        checkpoint.save_state = saved

    st = checkpoint.load_state(p_int)
    assert int(st["next_start"]) == 4  # one chunk of 3 pairs completed
    resumed = checkpoint.run_sequence_checkpointed(
        key, frames, corners, present, init, K, L, CFG, path=p_int, chunk=3
    )
    np.testing.assert_array_equal(resumed.abs_poses, full.abs_poses)
    np.testing.assert_array_equal(resumed.rel_poses, full.rel_poses)
    np.testing.assert_array_equal(resumed.ok, full.ok)


def test_checkpoint_stale_state_restarts(tmp_path):
    seq = _tiny_sequence(5)
    frames, corners, present, init, K, L = _ckpt_args(seq)
    p = str(tmp_path / "c.npz")
    checkpoint.save_state(p, {"n_total": np.asarray(999), "chunk": np.asarray(3)})
    traj = checkpoint.run_sequence_checkpointed(
        jax.random.PRNGKey(0), frames, corners, present, init, K, L, CFG, path=p, chunk=2
    )
    assert traj.abs_poses.shape == (5, 4, 4)
    st = checkpoint.load_state(p)
    assert int(st["n_total"]) == 5 and int(st["next_start"]) == 5


def test_atomic_save_leaves_no_tmp(tmp_path):
    p = str(tmp_path / "s.npz")
    checkpoint.save_state(p, {"a": np.arange(3)})
    files = {f.name for f in tmp_path.iterdir()}
    assert files == {"s.npz"}
    st = checkpoint.load_state(p)
    np.testing.assert_array_equal(st["a"], np.arange(3))
    assert checkpoint.load_state(str(tmp_path / "missing.npz")) is None
