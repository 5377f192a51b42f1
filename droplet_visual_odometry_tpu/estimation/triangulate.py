"""General projection-matrix triangulation (cv.triangulatePoints parity).

The reference triangulates marker corners between two full projection matrices
(visual_odometry_v3.py:263-291). Here the DLT is batched over points and
jit-friendly; used by the metric-scale module and by tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(
    P1: jax.Array, P2: jax.Array, pts1_px: jax.Array, pts2_px: jax.Array
) -> jax.Array:
    """DLT triangulation: P1, P2 (3, 4) projection matrices; pts (N, 2) pixels.

    Returns (N, 4) homogeneous points (like cv.triangulatePoints, transposed),
    normalised so the largest-magnitude component has unit scale is NOT applied;
    use `dehomogenize` for (N, 3) Euclidean output.
    """

    def rows(P, x):
        r1 = x[:, 0:1, None] * P[None, 2, :] - P[None, 0, :]
        r2 = x[:, 1:2, None] * P[None, 2, :] - P[None, 1, :]
        return jnp.concatenate([r1, r2], axis=-2)  # (N, 2, 4)

    A = jnp.concatenate([rows(P1, pts1_px), rows(P2, pts2_px)], axis=-2)  # (N, 4, 4)
    # Row-normalise for conditioning (pixel-scale rows otherwise dominate).
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("nki,nkj->nij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]  # (N, 4)


def dehomogenize(Xh: jax.Array) -> jax.Array:
    """(N, 4) -> (N, 3) with sign fixed so w > 0."""
    w = Xh[..., 3:4]
    sign = jnp.where(w == 0, 1.0, jnp.sign(w))
    return Xh[..., :3] * sign / jnp.maximum(jnp.abs(w), 1e-12)
