"""Tests for the float-descriptor (SIFT-mode) frontend + L2 matching."""

import jax
import jax.numpy as jnp
import numpy as np

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
from droplet_visual_odometry_tpu.estimation.vo import VOConfig, run_sequence
from droplet_visual_odometry_tpu.frontend import matcher, sift
from droplet_visual_odometry_tpu.frontend.features import detect_and_describe


def _blob_image(h=120, w=160, seed=0, n=12):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 40.0, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    centers = rng.uniform([25, 25], [h - 25, w - 25], size=(n, 2))
    for cy, cx in centers:
        img += 120.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.5**2))
    return img, centers


def test_detect_blobs_finds_injected_blobs():
    img, centers = _blob_image()
    kps = sift.detect_blobs(jnp.asarray(img), k=32, threshold=0.5)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert len(xy) >= len(centers) // 2
    # top_k returns detections strongest-first: the strongest ones must sit on
    # true blob centres (weaker slots may be skirt responses).
    top = xy[:10]
    d = np.linalg.norm(top[:, None, :] - centers[None, :, ::-1], axis=-1).min(axis=1)
    assert np.median(d) < 2.0, d


def test_descriptor_shape_and_norm():
    img, _ = _blob_image(seed=1)
    feats = sift.detect_and_describe(jnp.asarray(img), k=32, threshold=0.5)
    desc = np.asarray(feats.desc)
    valid = np.asarray(feats.valid)
    assert desc.shape == (32, sift.N_DIM)
    norms = np.linalg.norm(desc[valid], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # Clip-at-0.2 happens BEFORE the final renorm (standard SIFT), so single
    # entries can exceed 0.2 afterwards but stay well below 1.
    assert 0.0 <= float(desc.min()) and float(desc.max()) < 1.0


def test_l2_matrix_matches_numpy():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(20, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    d2 = np.asarray(matcher.l2_matrix(a, b))
    expect = ((np.asarray(a)[:, None, :] - np.asarray(b)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, expect, rtol=1e-4, atol=1e-4)


def test_float_match_dispatch_ratio():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    noisy = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
    perm = rng.permutation(30)
    m = matcher.match(
        jnp.asarray(base), jnp.asarray(noisy[perm]), mode="ratio", ratio=0.8
    )
    valid = np.asarray(m.valid)
    assert valid.mean() > 0.9
    # Each query matches its permuted twin.
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(m.idx)[valid], inv[valid])


def test_sift_mode_vo_tracks_synthetic():
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(n_frames=6, width=512, height=384, n_landmarks=350)
    )
    cfg = VOConfig(
        frontend="sift",
        match_mode="ratio",
        dog_threshold=0.5,
        n_keypoints=512,
        ransac=RansacConfig(n_hypotheses=512, lo_hypotheses=128),
    )
    traj = run_sequence(
        jax.random.PRNGKey(0),
        jnp.asarray(seq.frames, jnp.float32),
        jnp.asarray(seq.marker_corners),
        jnp.asarray(seq.marker_present),
        jnp.asarray(seq.marker_poses[0]),
        jnp.asarray(seq.camera.K, jnp.float32),
        seq.real_marker_length,
        cfg,
    )
    ok = np.asarray(traj.ok)
    assert ok.mean() >= 0.6, ok
    est = np.linalg.inv(np.asarray(traj.abs_poses[-1], np.float64))[:3, 3]
    gt = np.linalg.inv(np.asarray(seq.marker_poses[-1], np.float64))[:3, 3]
    assert np.linalg.norm(est - gt) < 0.3, (est, gt)


def test_features_mode_switch():
    img, _ = _blob_image(seed=4)
    f_orb = detect_and_describe(jnp.asarray(img), k=64)
    f_sift = detect_and_describe(jnp.asarray(img), k=64, mode="sift", dog_threshold=0.5)
    assert f_orb.desc.dtype == jnp.uint32
    assert f_sift.desc.dtype == jnp.float32
    assert f_sift.desc.shape == (64, 128)
