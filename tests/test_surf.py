"""Tests for the SURF-mode frontend (Hessian blobs + 64-d descriptor) and the
multi-octave SIFT scale space — completing the reference's three-way mode
switch (visual_odometry_v3.py:93-107)."""

import jax
import jax.numpy as jnp
import numpy as np

from droplet_visual_odometry_tpu.data import synthetic
from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
from droplet_visual_odometry_tpu.estimation.vo import VOConfig, run_sequence
from droplet_visual_odometry_tpu.frontend import matcher, sift, surf
from droplet_visual_odometry_tpu.frontend.features import detect_and_describe


def _blob_image(h=120, w=160, seed=0, n=12, sigma=2.5):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 40.0, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    centers = rng.uniform([25, 25], [h - 25, w - 25], size=(n, 2))
    for cy, cx in centers:
        img += 120.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
    return img, centers


class TestSurfDetector:
    def test_hessian_finds_blobs(self):
        img, centers = _blob_image()
        kps = surf.detect_blobs(jnp.asarray(img), k=32, threshold=0.5)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(xy) >= len(centers) // 2
        top = xy[:10]
        d = np.linalg.norm(top[:, None, :] - centers[None, :, ::-1], axis=-1).min(1)
        assert np.median(d) < 2.5, d

    def test_hessian_rejects_edges(self):
        """det(H) < 0 on a pure step edge (one principal curvature ~0):
        the determinant detector must not fire along edges (SURF's point)."""
        img = np.full((96, 96), 50.0, np.float32)
        img[:, 48:] = 200.0
        resp = np.asarray(surf.hessian_response(jnp.asarray(img)))
        # Response on the edge column stays tiny vs a blob of the same contrast.
        blob, _ = _blob_image(96, 96, n=1)
        blob_resp = np.asarray(surf.hessian_response(jnp.asarray(blob)))
        assert resp[20:76, 40:56].max() < 0.15 * blob_resp.max()

    def test_multi_sigma_catches_large_blobs(self):
        """A large (sigma~8) blob must still be detected (the scale ladder)."""
        img, centers = _blob_image(160, 160, n=4, sigma=8.0)
        kps = surf.detect_blobs(jnp.asarray(img), k=16, threshold=0.2)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(xy) >= 1
        d = np.linalg.norm(xy[:4][:, None, :] - centers[None, :, ::-1], axis=-1).min(1)
        assert np.min(d) < 3.0, d


class TestSurfDescriptor:
    def test_shape_and_norm(self):
        img, _ = _blob_image(seed=1)
        feats = surf.detect_and_describe(jnp.asarray(img), k=32, threshold=0.5)
        desc = np.asarray(feats.desc)
        valid = np.asarray(feats.valid)
        assert desc.shape == (32, surf.N_DIM)
        np.testing.assert_allclose(
            np.linalg.norm(desc[valid], axis=1), 1.0, atol=1e-3
        )

    def test_rotation_tolerance(self):
        """90-degree-rotated image: descriptors of the same blobs must match
        (the steered grid gives rotation invariance)."""
        img, _ = _blob_image(h=128, w=128, seed=2)
        rot = np.rot90(img).copy()
        fa = surf.detect_and_describe(jnp.asarray(img), k=24, threshold=0.5)
        fb = surf.detect_and_describe(jnp.asarray(rot), k=24, threshold=0.5)
        m = matcher.match(fa.desc, fb.desc, fa.valid, fb.valid, mode="ratio", ratio=0.85)
        pa, pb, mask = matcher.gather_correspondences(fa.xy, fb.xy, m)
        pa = np.asarray(pa)[np.asarray(mask)]
        pb = np.asarray(pb)[np.asarray(mask)]
        assert len(pa) >= 6, len(pa)
        # Check the match geometry: np.rot90 maps (x, y) -> (y, H-1-x).
        expect = np.stack([pa[:, 1], 128 - 1 - pa[:, 0]], axis=1)
        frac_good = (np.linalg.norm(pb - expect, axis=1) < 3.0).mean()
        assert frac_good > 0.7, frac_good


class TestSurfVO:
    def test_surf_mode_vo_tracks_synthetic(self):
        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(n_frames=5, width=512, height=384, n_landmarks=350)
        )
        cfg = VOConfig(
            frontend="surf",
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
        assert ok.mean() >= 0.5, ok
        est = np.linalg.inv(np.asarray(traj.abs_poses[-1], np.float64))[:3, 3]
        gt = np.linalg.inv(np.asarray(seq.marker_poses[-1], np.float64))[:3, 3]
        assert np.linalg.norm(est - gt) < 0.35, (est, gt)

    def test_mode_switch_shapes(self):
        img, _ = _blob_image(seed=4)
        f = detect_and_describe(jnp.asarray(img), k=64, mode="surf", dog_threshold=0.5)
        assert f.desc.dtype == jnp.float32
        assert f.desc.shape == (64, 64)


class TestSiftOctaves:
    def test_multi_octave_matches_across_2x_scale(self):
        """The Missing-#4 capability: descriptors must match between an image
        and its 2x-downscaled version. Multi-octave SIFT pairs octave-(o+1)
        keypoints of A with octave-o keypoints of B; single-octave has no
        cross-scale pairing and must do measurably worse."""
        from droplet_visual_odometry_tpu.data import synthetic
        from droplet_visual_odometry_tpu.frontend import filters

        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(
                n_frames=1, width=512, height=384, n_landmarks=250, noise_std=1.0
            )
        )
        a = jnp.asarray(seq.frames[0], jnp.float32)
        b = filters.downsample2(a)  # 2x smaller view of the same scene

        def correct_matches(n_octaves):
            fa = sift.detect_and_describe(a, k=128, threshold=0.5, n_octaves=n_octaves)
            fb = sift.detect_and_describe(b, k=128, threshold=0.5, n_octaves=n_octaves)
            m = matcher.match(
                fa.desc, fb.desc, fa.valid, fb.valid, mode="ratio", ratio=0.8
            )
            pa, pb, mask = matcher.gather_correspondences(fa.xy, fb.xy, m)
            pa = np.asarray(pa)[np.asarray(mask)]
            pb = np.asarray(pb)[np.asarray(mask)]
            if len(pa) == 0:
                return 0
            # Geometric oracle: a correct match satisfies xy_A ~= 2 * xy_B.
            return int((np.linalg.norm(pa - 2.0 * pb, axis=1) < 4.0).sum())

        n1 = correct_matches(1)
        n3 = correct_matches(3)
        assert n3 >= 10, (n3, n1)
        assert n3 >= 2 * n1, (n3, n1)

    def test_octave_coords_within_image(self):
        img, _ = _blob_image(h=256, w=256, seed=6)
        f = sift.detect_and_describe(jnp.asarray(img), k=64, threshold=0.5, n_octaves=3)
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert np.all(xy >= 0) and np.all(xy[:, 0] < 256) and np.all(xy[:, 1] < 256)


class TestSurfOctaves:
    def test_scale_adapted_matches_across_2x_scale(self):
        """Scale adaptation (round-2 Weak #6): octave-described SURF must
        match an image against its 2x-downscaled self much better than the
        flat single-resolution variant, whose fixed 37-px full-res patch
        describes only the centre texture of coarse blobs."""
        from droplet_visual_odometry_tpu.data import synthetic
        from droplet_visual_odometry_tpu.frontend import filters, surf

        seq = synthetic.render_sequence(
            synthetic.SyntheticConfig(
                n_frames=1, width=512, height=384, n_landmarks=250, noise_std=1.0
            )
        )
        a = jnp.asarray(seq.frames[0], jnp.float32)
        b = filters.downsample2(a)

        def correct_matches(n_octaves):
            fa = surf.detect_and_describe(a, k=128, threshold=0.5, n_octaves=n_octaves)
            fb = surf.detect_and_describe(b, k=128, threshold=0.5, n_octaves=n_octaves)
            m = matcher.match(
                fa.desc, fb.desc, fa.valid, fb.valid, mode="ratio", ratio=0.8
            )
            pa, pb, mask = matcher.gather_correspondences(fa.xy, fb.xy, m)
            pa = np.asarray(pa)[np.asarray(mask)]
            pb = np.asarray(pb)[np.asarray(mask)]
            if len(pa) == 0:
                return 0
            return int((np.linalg.norm(pa - 2.0 * pb, axis=1) < 4.0).sum())

        n1 = correct_matches(1)
        n3 = correct_matches(3)
        assert n3 >= 10, (n3, n1)
        assert n3 >= 2 * n1, (n3, n1)

    def test_octave_coords_within_image(self):
        from droplet_visual_odometry_tpu.frontend import surf

        img, _ = _blob_image(h=256, w=256, seed=6)
        f = surf.detect_and_describe(jnp.asarray(img), k=64, threshold=0.5, n_octaves=3)
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert np.all(xy >= 0) and np.all(xy[:, 0] < 256) and np.all(xy[:, 1] < 256)
