"""Metric scale from the fiducial marker.

Reference behavior (visual_odometry_v3.py:263-291, 309-326): triangulate the
marker corners between the previous and current projection matrices, measure
the triangulated side length, and scale the unit translation by
real_marker_length / measured_length.

Two deliberate deviations, documented per SURVEY.md §7 "quirks":
  * The reference's P1 is the *previous pair's* relative projection matrix
    (v3:344), which is geometrically inconsistent after the first pair; here
    P1 = K[I|0] in prev-camera coords and P2 = K[R|t] — the correct pairwise
    geometry.
  * The reference measures a single side (corners 0-1, v3:276-279); we default
    to the mean of all four sides (robust to one bad corner) with
    `side="reference"` available for exact single-side parity.

Beyond parity, `marker_scale_gn` replaces the triangulation with a joint
Gauss-Newton fit of (marker pose, scale) that exploits the marker's KNOWN
metric shape in both views. The triangulation estimator is unusable under
corner noise at VO baselines: with per-pair |t| ~ 1e-2 of the viewing
distance (the reference's own regime, frame_extraction_notes.txt ~1e-3 m
steps), 1 px of corner noise blows corner depths up by the z^2/(f*b)
triangulation factor and INFLATES the measured side (convexity), biasing the
scale several-fold low — measured -1.8 log-mean on the 1 px-noise parity
scenario, for the reference port and the triangulation path alike. The GN
fit instead pins marker depth by its projected size (error ~ sigma/span, a
few percent, no bias) and recovers the scale as the metric baseline
explaining the inter-frame corner motion at that depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.estimation.triangulate import (
    dehomogenize,
    triangulate_points,
)
from droplet_visual_odometry_tpu.ops import linalg as fast_linalg


def marker_side_length(
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    prev_corners_px: jax.Array,
    curr_corners_px: jax.Array,
    side: str = "mean",
) -> jax.Array:
    """Triangulated marker side length under a unit-|t| relative pose.

    prev/curr_corners_px: (4, 2) marker corners in each frame.
    Returns scalar side length in the unit-translation frame.
    """
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = dehomogenize(triangulate_points(P1, P2, prev_corners_px, curr_corners_px))
    if side == "reference":
        return jnp.linalg.norm(X[0] - X[1])
    d = jnp.stack(
        [
            jnp.linalg.norm(X[0] - X[1]),
            jnp.linalg.norm(X[1] - X[2]),
            jnp.linalg.norm(X[2] - X[3]),
            jnp.linalg.norm(X[3] - X[0]),
        ]
    )
    return jnp.mean(d)


def canonical_corners(L, dtype=jnp.float32) -> jax.Array:
    """Marker corners in the marker frame, (4, 3): the STag/synthetic winding
    (data/synthetic.marker_world_corners). A consistently-rotated or
    reflected detector order is harmless — it re-labels the marker frame,
    which cancels in relative geometry and scale."""
    s = L / 2.0
    return jnp.asarray(
        [[-s, -s, 0.0], [s, -s, 0.0], [s, s, 0.0], [-s, s, 0.0]], dtype
    )


def square_pnp(corners_px: jax.Array, K: jax.Array, L: float) -> jax.Array:
    """cTm of a known-size planar square from its 4 image corners.

    Homography DLT (exactly determined by 4 points; solved as the 9x9
    normal-equation null vector with the fixed-cost inverse-iteration
    eigensolver) + Zhang decomposition H = K [r1 r2 t], orthonormalised via
    the fixed-cost 3x3 SVD. Returns (4, 4) cTm with t_z > 0.
    """
    obj = canonical_corners(L, corners_px.dtype)[:, :2]  # (4, 2) planar
    # Condition: normalise pixel coords by K once (work in normalized cam).
    x = (corners_px[:, 0] - K[0, 2]) / K[0, 0]
    y = (corners_px[:, 1] - K[1, 2]) / K[1, 1]
    u, v = obj[:, 0] / L, obj[:, 1] / L  # unit-square object coords
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # Rows of the DLT system for H mapping (u, v, 1) -> (x, y, 1).
    r1 = jnp.stack([u, v, ones, zeros, zeros, zeros, -u * x, -v * x, -x], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, u, v, ones, -u * y, -v * y, -y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (8, 9)
    AtA = A.T @ A
    h = fast_linalg.smallest_eigvec(AtA)
    H = h.reshape(3, 3)
    # H maps unit-square coords; rescale columns so translation is metric:
    # X = u*L etc. -> H_metric = H @ diag(1/L, 1/L, 1).
    G = H.at[:, :2].multiply(1.0 / L)
    g1, g2, g3 = G[:, 0], G[:, 1], G[:, 2]
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(g1) + jnp.linalg.norm(g2), 1e-12)
    sign = jnp.where(g3[2] * lam < 0, -1.0, 1.0)  # marker in front: t_z > 0
    r1c = sign * lam * g1
    r2c = sign * lam * g2
    t = sign * lam * g3
    R_raw = jnp.stack([r1c, r2c, jnp.cross(r1c, r2c)], axis=-1)
    U, _, Vt = fast_linalg.svd3x3(R_raw)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))  # proper rotation
    T = jnp.eye(4, dtype=corners_px.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def _project(K: jax.Array, X: jax.Array) -> jax.Array:
    z = jnp.maximum(X[..., 2:3], 1e-9)
    xy = X[..., :2] / z
    return xy * jnp.asarray([K[0, 0], K[1, 1]]) + jnp.asarray([K[0, 2], K[1, 2]])


def marker_scale_gn(
    K: jax.Array,
    R: jax.Array,
    t_unit: jax.Array,
    prev_corners_px: jax.Array,
    curr_corners_px: jax.Array,
    L: float,
    iters: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """Joint GN fit of (cTm_prev, log scale) to both frames' marker corners.

    The relative rotation R and unit translation t_unit come from feature VO
    and are held FIXED — the marker contributes only the metric scale (and is
    never used as a pose oracle, which would collapse the marker-derived
    evaluation); 16 reprojection residuals constrain 7 parameters. Returns
    (scale, converged_ok).
    """
    dtype = prev_corners_px.dtype
    model = canonical_corners(L, dtype)
    M0 = square_pnp(prev_corners_px, K, L)
    target = jnp.concatenate([prev_corners_px, curr_corners_px], axis=0).reshape(-1)

    # Init log-scale from the PnP pair's relative translation magnitude
    # (folded-noise biased, but within GN's basin).
    M0c = square_pnp(curr_corners_px, K, L)
    s_init = jnp.linalg.norm(M0c[:3, 3] - R @ M0[:3, 3])
    ls0 = jnp.log(jnp.clip(s_init, 1e-6, 1e6))

    from droplet_visual_odometry_tpu.core import se3

    fx, fy = K[0, 0], K[1, 1]
    eye3 = jnp.eye(3, dtype=dtype)

    def residual(M, ls):
        s = jnp.exp(ls)
        X1 = model @ M[:3, :3].T + M[:3, 3]  # (4, 3) corners in prev cam
        X2 = X1 @ R.T + s * t_unit
        pred = jnp.concatenate([_project(K, X1), _project(K, X2)], axis=0)
        return pred.reshape(-1) - target, X1, X2, s

    def dproj(X):
        """(N, 3) -> (N, 2, 3) projection Jacobian d(u,v)/dX."""
        x, y = X[..., 0], X[..., 1]
        z = jnp.maximum(X[..., 2], 1e-9)
        zeros = jnp.zeros_like(z)
        row_u = jnp.stack([fx / z, zeros, -fx * x / (z * z)], axis=-1)
        row_v = jnp.stack([zeros, fy / z, -fy * y / (z * z)], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)

    def gn_step(_, carry):
        M, ls, best = carry
        r, X1, X2, s = residual(M, ls)
        # Analytic (16, 7) Jacobian — each point's left-multiplicative twist
        # derivative is dX1/d[v, w] = [I | -hat(X1)]; frame 2 chains through
        # the fixed R and adds the scale column s * t_unit.
        dX1 = jnp.concatenate(
            [jnp.broadcast_to(eye3, (4, 3, 3)), -se3._hat(X1)], axis=-1
        )  # (4, 3, 6)
        J1 = jnp.einsum("nij,njk->nik", dproj(X1), dX1)  # (4, 2, 6)
        A2 = dproj(X2)
        J2 = jnp.einsum("nij,jm,nmk->nik", A2, R, dX1)  # (4, 2, 6)
        Jls = jnp.einsum("nij,j->ni", A2, s * t_unit)  # (4, 2)
        top = jnp.concatenate([J1, jnp.zeros((4, 2, 1), dtype)], axis=-1)
        bot = jnp.concatenate([J2, Jls[..., None]], axis=-1)
        J = jnp.concatenate([top, bot], axis=0).reshape(16, 7)

        JtJ = J.T @ J
        damp = 1e-6 * jnp.trace(JtJ) / 7.0 + 1e-12
        dx = fast_linalg.solve_spd(JtJ, -(J.T @ r), eps=damp)
        M_new = se3.se3_exp(dx[:6]) @ M
        ls_new = ls + dx[6]
        r_new, _, _, _ = residual(M_new, ls_new)
        better = jnp.sum(r_new**2) <= jnp.sum(r**2)
        M = jnp.where(better, M_new, M)
        ls = jnp.where(better, ls_new, ls)
        return M, ls, jnp.minimum(best, jnp.sum(jnp.where(better, r_new, r) ** 2))

    big = jnp.asarray(jnp.inf, dtype)
    M, ls, best = jax.lax.fori_loop(0, iters, gn_step, (M0, ls0, big))
    s = jnp.exp(ls)
    rms = jnp.sqrt(best / 16.0)
    ok = jnp.isfinite(s) & (rms < 20.0)  # sane reprojection after the fit
    return s, ok


def scale_factor_with_valid(
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    prev_corners_px: jax.Array,
    curr_corners_px: jax.Array,
    real_marker_length: float,
    marker_valid: jax.Array,
    side: str = "mean",
    max_scale: float = 1e3,
    estimator: str = "gn",
) -> tuple[jax.Array, jax.Array]:
    """(scale, scale_ok): the factor plus whether it came from a live marker
    measurement (False -> the 1.0 fallback was used). The validity bit feeds
    the sequence-level 'hold' scale mode (vo.py), which forward-fills the
    last live scale through marker-absent stretches.

    estimator: 'gn' (joint pose+scale Gauss-Newton on the known marker shape
    — noise-robust, see module docstring) or 'triangulation' (the
    reference's corner-triangulation method, v3:263-291)."""
    if estimator == "gn":
        s, fit_ok = marker_scale_gn(
            K, R, t, prev_corners_px, curr_corners_px, real_marker_length
        )
    elif estimator == "triangulation":
        measured = marker_side_length(K, R, t, prev_corners_px, curr_corners_px, side)
        s = real_marker_length / jnp.maximum(measured, 1e-12)
        fit_ok = jnp.asarray(True)
    else:
        raise ValueError(f"unknown scale estimator: {estimator}")
    good = marker_valid & fit_ok & jnp.isfinite(s) & (s > 0) & (s < max_scale)
    return jnp.where(good, s, 1.0), good


def scale_factor(
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    prev_corners_px: jax.Array,
    curr_corners_px: jax.Array,
    real_marker_length: float,
    marker_valid: jax.Array,
    side: str = "mean",
    max_scale: float = 1e3,
) -> jax.Array:
    """scaling_factor = real_marker_length / triangulated_length (v3:281, 322).

    When the marker is absent in either frame (marker_valid False) or the
    triangulation degenerates, returns 1.0 (scale-free unit translation, the
    behavior of the launch-processes variant, launch_processes:128-137) —
    the reference itself would crash here (SURVEY.md §7 degenerate cases).
    """
    s, _ = scale_factor_with_valid(
        K,
        R,
        t,
        prev_corners_px,
        curr_corners_px,
        real_marker_length,
        marker_valid,
        side,
        max_scale,
    )
    return s
