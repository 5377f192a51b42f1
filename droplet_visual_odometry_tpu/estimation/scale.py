"""Metric scale from fiducial-marker corner triangulation.

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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.estimation.triangulate import (
    dehomogenize,
    triangulate_points,
)


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
) -> tuple[jax.Array, jax.Array]:
    """(scale, scale_ok): the factor plus whether it came from a live marker
    triangulation (False -> the 1.0 fallback was used). The validity bit
    feeds the sequence-level 'hold' scale mode (vo.py), which forward-fills
    the last live scale through marker-absent stretches."""
    measured = marker_side_length(K, R, t, prev_corners_px, curr_corners_px, side)
    s = real_marker_length / jnp.maximum(measured, 1e-12)
    good = marker_valid & jnp.isfinite(s) & (s > 0) & (s < max_scale)
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
