"""Multi-view feature tracks over a keyframe window (fixed-shape).

Glue between the frontend and the BA backend — NEW vs the reference, which
never associates features across more than one pair (SURVEY.md §5). Tracks are
anchored at the window's first keyframe: slot l of the window corresponds to
keypoint l of keyframe 0, chained forward through consecutive-keyframe
matches. This keeps every shape static: a window with W keyframes and K
keypoint slots yields exactly a (W, K) observation grid + mask.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.frontend import matcher
from droplet_visual_odometry_tpu.frontend.orb import Features


class TrackGrid(NamedTuple):
    obs_uv: jax.Array  # (W, K, 2) pixel observation of track l in keyframe w
    obs_mask: jax.Array  # (W, K) bool


def build_tracks(
    features: Sequence[Features],
    match_mode: str = "crosscheck",
    max_distance: float = 80.0,
) -> TrackGrid:
    """Chain matches through W keyframes -> (W, K) anchored track grid.

    max_distance gates continuations on descriptor Hamming distance (a good
    ORB-style match is well under 80/256 bits); mistracks that survive the
    gate are left to the BA backend's Huber kernel.
    """
    W = len(features)
    K = features[0].xy.shape[0]
    # kp_of_track[l] = keypoint index of track l in current keyframe (-1 dead).
    kp_idx = jnp.arange(K, dtype=jnp.int32)
    alive = features[0].valid

    obs = [features[0].xy]
    mask = [alive]
    for w in range(1, W):
        m = matcher.match(
            features[w - 1].desc,
            features[w].desc,
            features[w - 1].valid,
            features[w].valid,
            mode=match_mode,
            max_distance=max_distance,
        )
        # Track l (at kp_idx[l] in KF w-1) continues iff that keypoint matched.
        nxt = m.idx[kp_idx]
        ok = alive & m.valid[kp_idx]
        kp_idx = jnp.where(ok, nxt, 0)
        alive = ok
        obs.append(features[w].xy[kp_idx])
        mask.append(alive)
    return TrackGrid(obs_uv=jnp.stack(obs), obs_mask=jnp.stack(mask))


def triangulate_tracks(
    grid: TrackGrid,
    poses_cTw: jax.Array,  # (W, 4, 4)
    K: jax.Array,
    min_views: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Initial landmarks from all observations of each track (multi-view DLT
    via the 3x3 inhomogeneous normal equations, masked over views).

    Returns ((K,) x 3 landmark positions in world frame, (K,) valid mask).
    """
    from droplet_visual_odometry_tpu.ops import linalg as fast_linalg

    W = grid.obs_uv.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # Normalized rays per observation.
    x = (grid.obs_uv[..., 0] - cx) / fx
    y = (grid.obs_uv[..., 1] - cy) / fy

    P = poses_cTw[:, :3, :]  # (W, 3, 4) [R|t] rows
    # DLT rows: x*(P3 . X) - (P1 . X) = 0 etc., with X = [p; 1].
    r1 = x[..., None] * P[:, None, 2, :] - P[:, None, 0, :]  # (W, K, 4)
    r2 = y[..., None] * P[:, None, 2, :] - P[:, None, 1, :]
    m = grid.obs_mask[..., None].astype(r1.dtype)
    A = jnp.concatenate([r1 * m, r2 * m], axis=0)  # (2W, K, 4)
    A = jnp.swapaxes(A, 0, 1)  # (K, 2W, 4)
    M = A[..., :3]
    d = A[..., 3]
    MtM = jnp.einsum("kni,knj->kij", M, M)
    Mtd = jnp.einsum("kni,kn->ki", M, d)
    tr = (MtM[..., 0, 0] + MtM[..., 1, 1] + MtM[..., 2, 2])[..., None, None]
    X = fast_linalg.solve_spd(MtM + 1e-7 * tr * jnp.eye(3, dtype=M.dtype), -Mtd)

    views = jnp.sum(grid.obs_mask, axis=0)
    # Cheirality: positive depth in every observing view.
    p_cam = jnp.einsum("wij,kj->wki", poses_cTw[:, :3, :3], X) + poses_cTw[:, None, :3, 3]
    depth_ok = jnp.all(jnp.where(grid.obs_mask, p_cam[..., 2] > 1e-3, True), axis=0)
    valid = (views >= min_views) & depth_ok & jnp.all(jnp.isfinite(X), axis=-1)
    return X, valid


def filter_by_reprojection(
    grid: TrackGrid,
    X: jax.Array,
    poses_cTw: jax.Array,
    K: jax.Array,
    max_err_px: float = 2.0,
    min_views: int = 2,
) -> TrackGrid:
    """Drop observations whose reprojection error under (X, poses) exceeds
    max_err_px, then kill tracks left with < min_views — the standard SfM
    outlier-rejection pass between triangulation and BA (catches the corner
    swaps that descriptor matching cannot: a swapped corner violates the
    multi-view geometry even though its descriptor matches)."""
    R = poses_cTw[:, :3, :3]
    t = poses_cTw[:, :3, 3]
    p = jnp.einsum("wij,kj->wki", R, X) + t[:, None, :]
    z = jnp.maximum(p[..., 2], 1e-6)
    u = K[0, 0] * p[..., 0] / z + K[0, 2]
    v = K[1, 1] * p[..., 1] / z + K[1, 2]
    err = jnp.linalg.norm(jnp.stack([u, v], -1) - grid.obs_uv, axis=-1)
    keep = grid.obs_mask & (err < max_err_px) & (p[..., 2] > 1e-3)
    views = jnp.sum(keep, axis=0)
    keep = keep & (views >= min_views)[None, :]
    return TrackGrid(obs_uv=grid.obs_uv, obs_mask=keep)
