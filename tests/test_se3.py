"""Golden tests for core.se3 against scipy.spatial.transform (closed forms)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.core import se3

RNG = np.random.default_rng(0)


def random_rotations(n):
    return Rotation.random(n, random_state=42)


class TestQuaternion:
    def test_quat_to_rotmat_matches_scipy(self):
        r = random_rotations(64)
        q = r.as_quat()  # scipy uses xyzw too
        R_ours = np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float64)))
        np.testing.assert_allclose(R_ours, r.as_matrix(), atol=1e-6)

    def test_rotmat_to_quat_roundtrip(self):
        r = random_rotations(128)
        R = jnp.asarray(r.as_matrix())
        q = np.asarray(se3.rotmat_to_quat(R))
        q_ref = r.as_quat()
        # sign-insensitive comparison
        sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)

    def test_rotmat_to_quat_near_identity_and_pi(self):
        for angles in ([1e-8, 0, 0], [np.pi - 1e-7, 0, 0], [0, np.pi, 0], [0, 0, np.pi]):
            r = Rotation.from_rotvec(angles)
            q = np.asarray(se3.rotmat_to_quat(jnp.asarray(r.as_matrix())))
            R_back = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
            np.testing.assert_allclose(R_back, r.as_matrix(), atol=1e-5)

    def test_quat_multiply_matches_matrix_product(self):
        r1, r2 = random_rotations(32), random_rotations(32)
        q = np.asarray(
            se3.quat_multiply(jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat()))
        )
        R = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R, r1.as_matrix() @ r2.as_matrix(), atol=1e-5)


class TestEuler:
    def test_rxyz_is_intrinsic_xyz(self):
        """tf 'rxyz' (used at visual_odometry_v3.py:334) == scipy intrinsic XYZ."""
        e = RNG.uniform(-1.2, 1.2, size=(32, 3))
        R_ours = np.asarray(se3.euler_to_rotmat(jnp.asarray(e), axes="rxyz"))
        R_ref = Rotation.from_euler("XYZ", e).as_matrix()
        np.testing.assert_allclose(R_ours, R_ref, atol=1e-6)

    def test_sxyz_is_extrinsic_xyz(self):
        """tf 'sxyz' (used at visual_odometry_v3.py:141) == scipy extrinsic xyz."""
        e = RNG.uniform(-1.2, 1.2, size=(32, 3))
        R_ours = np.asarray(se3.euler_to_rotmat(jnp.asarray(e), axes="sxyz"))
        R_ref = Rotation.from_euler("xyz", e).as_matrix()
        np.testing.assert_allclose(R_ours, R_ref, atol=1e-6)

    @pytest.mark.parametrize("axes", ["rxyz", "sxyz"])
    def test_euler_roundtrip(self, axes):
        e = RNG.uniform(-1.2, 1.2, size=(64, 3))
        R = se3.euler_to_rotmat(jnp.asarray(e), axes=axes)
        e_back = se3.rotmat_to_euler(R, axes=axes)
        R_back = se3.euler_to_rotmat(e_back, axes=axes)
        np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-5)

    @pytest.mark.parametrize("axes", ["rxyz", "sxyz"])
    def test_euler_gimbal_lock(self, axes):
        e = np.array([[0.3, np.pi / 2, 0.2], [0.1, -np.pi / 2, -0.4]])
        R = se3.euler_to_rotmat(jnp.asarray(e), axes=axes)
        e_back = se3.rotmat_to_euler(R, axes=axes)
        R_back = se3.euler_to_rotmat(e_back, axes=axes)
        np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-5)


class TestSE3:
    def test_inverse(self):
        r = random_rotations(16)
        t = RNG.normal(size=(16, 3))
        T = se3.make_se3(jnp.asarray(r.as_matrix()), jnp.asarray(t))
        I = np.asarray(T @ se3.inverse(T))
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-6)

    def test_from_translation_quaternion(self):
        """Parity with reference transformation_from_translation_quaternion
        (pose_estimation_module.py:15-23)."""
        r = random_rotations(8)
        t = RNG.normal(size=(8, 3))
        T = np.asarray(
            se3.from_translation_quaternion(jnp.asarray(t), jnp.asarray(r.as_quat()))
        )
        np.testing.assert_allclose(T[:, :3, :3], r.as_matrix(), atol=1e-6)
        np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-6)
        np.testing.assert_allclose(T[:, 3], np.broadcast_to([0, 0, 0, 1.0], (8, 4)), atol=0)

    def test_relative_transform_conventions(self):
        r = random_rotations(2)
        prev = se3.make_se3(jnp.asarray(r.as_matrix()[0]), jnp.asarray([1.0, 2, 3]))
        curr = se3.make_se3(jnp.asarray(r.as_matrix()[1]), jnp.asarray([0.5, -1, 2]))
        m2m = np.asarray(se3.marker_to_marker(prev, curr))
        np.testing.assert_allclose(
            np.asarray(prev) @ m2m, np.asarray(curr), atol=1e-5
        )
        c2c = np.asarray(se3.camera_to_camera(prev, curr))
        np.testing.assert_allclose(
            c2c @ np.asarray(curr), np.asarray(prev), atol=1e-5
        )
        gtrel = np.asarray(se3.gt_relative(prev, curr))
        np.testing.assert_allclose(
            gtrel @ np.asarray(prev), np.asarray(curr), atol=1e-5
        )

    def test_transform_points(self):
        r = random_rotations(1)
        T = se3.make_se3(jnp.asarray(r.as_matrix()[0]), jnp.asarray([1.0, 2, 3]))
        pts = RNG.normal(size=(10, 3))
        out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
        ref = (r.as_matrix()[0] @ pts.T).T + np.array([1.0, 2, 3])
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestLieMaps:
    def test_so3_exp_log_roundtrip(self):
        # log returns the principal branch, so sample |w| < pi.
        w = RNG.normal(size=(64, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True)
        w = w * RNG.uniform(1e-3, np.pi - 0.05, size=(64, 1))
        R = se3.so3_exp(jnp.asarray(w))
        np.testing.assert_allclose(
            np.asarray(R), Rotation.from_rotvec(w).as_matrix(), atol=1e-6
        )
        w_back = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_so3_small_angle(self):
        w = np.array([[1e-9, 0, 0], [0, 0, 0]])
        R = se3.so3_exp(jnp.asarray(w))
        np.testing.assert_allclose(
            np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(se3.so3_log(R)), w, atol=1e-7)

    def test_se3_exp_log_roundtrip(self):
        xi = RNG.normal(size=(64, 6))
        wn = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, (np.pi - 0.05) / wn)  # principal branch
        T = se3.se3_exp(jnp.asarray(xi))
        xi_back = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(xi_back, xi, atol=1e-4)

    def test_se3_exp_pure_translation(self):
        xi = jnp.asarray([1.0, 2.0, 3.0, 0, 0, 0])
        T = np.asarray(se3.se3_exp(xi))
        expected = np.eye(4)
        expected[:3, 3] = [1, 2, 3]
        np.testing.assert_allclose(T, expected, atol=1e-6)

    def test_jittable_and_batched(self):
        f = jax.jit(lambda x: se3.se3_log(se3.se3_exp(x)))
        xi = jnp.asarray(RNG.normal(size=(4, 6)), jnp.float32)
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
