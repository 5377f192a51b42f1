"""Loop-closure detection: keyframe descriptor retrieval + geometric check.

The edge source for the pose-graph backend (BASELINE config #4) — entirely
NEW vs the reference, whose drift has no correction mechanism beyond the
marker oracle itself (traj_eval_ground_truth.py:279-298 is its drift oracle).

Stages, all fixed-shape device work orchestrated by thin host selection:

  1. RETRIEVAL — for every keyframe pair (a, b) with b - a >= min_gap, the
     number of mutual-best descriptor matches under a Hamming gate: one
     vmapped crosscheck matcher over the pair list, i.e. a batch of
     K x K Hamming matmuls on the MXU. The count is the place-recognition
     score (a cheap, training-free bag-of-features analog).
  2. SELECTION (host) — greedy top-scoring pairs above min_similarity, with
     suppression of near-duplicate pairs (within suppress_radius keyframes of
     an accepted pair), capped at max_candidates.
  3. VERIFICATION — two_frame_vo on each candidate pair (match + batched
     RANSAC essential matrix + cheirality + marker scale), vmapped over
     candidates. A candidate becomes an edge iff enough RANSAC inliers
     survive. Monocular scale: when the fiducial is visible in both
     keyframes the edge is metric (marker triangulation, scale_ok); when
     not, the unit translation is scaled to the CURRENT trajectory's
     implied step length — the edge then constrains rotation + direction
     but not scale (documented monocular limitation).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.core import se3
from droplet_visual_odometry_tpu.estimation.vo import VOConfig, two_frame_vo
from droplet_visual_odometry_tpu.frontend import matcher
from droplet_visual_odometry_tpu.frontend.orb import Features


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    min_gap: int = 8  # minimum keyframe separation for a loop candidate
    max_candidates: int = 8  # verified pairs per run
    min_similarity: int = 60  # descriptor-match count to shortlist a pair
    match_max_distance: float = 64.0  # Hamming gate for retrieval counts
    min_inliers: int = 40  # RANSAC inliers to accept an edge
    suppress_radius: int = 2  # keyframes; near-duplicate pair suppression
    weight: float = 2.0  # pose-graph edge weight (sequential edges = 1)


class LoopEdges(NamedTuple):
    """Accepted loop-closure edges between keyframe indices (into the
    keyframe list, not frame indices)."""

    i: np.ndarray  # (C,) int
    j: np.ndarray  # (C,) int
    rel: np.ndarray  # (C, 4, 4) measured c_j_T_c_i (VO convention), scaled
    scale_ok: np.ndarray  # (C,) bool — metric (marker) scale vs trajectory-implied
    n_inliers: np.ndarray  # (C,)


def _pair_list(n_kf: int, min_gap: int) -> tuple[np.ndarray, np.ndarray]:
    ia, ib = np.triu_indices(n_kf, k=min_gap)
    return ia.astype(np.int32), ib.astype(np.int32)


@jax.jit
def _retrieval_counts(
    desc: jax.Array, valid: jax.Array, ia: jax.Array, ib: jax.Array, max_distance: float
) -> jax.Array:
    """(P,) mutual-best match counts for keyframe pairs (ia, ib)."""

    def count(a, b):
        m = matcher.match(
            desc[a], desc[b], valid[a], valid[b], mode="crosscheck", max_distance=max_distance
        )
        return jnp.sum(m.valid).astype(jnp.int32)

    return jax.vmap(count)(ia, ib)


def find_loop_closures(
    feats: Features,  # batched over keyframes: leading axis Nk
    kf_abs: np.ndarray,  # (Nk, 4, 4) current keyframe absolute poses (cTm)
    kf_corners: np.ndarray,  # (Nk, 4, 2) marker corners (NaN where absent)
    kf_marker_present: np.ndarray,  # (Nk,)
    K: jax.Array,
    real_marker_length: float,
    vo_cfg: VOConfig,
    cfg: LoopClosureConfig = LoopClosureConfig(),
    seed: int = 0,
) -> LoopEdges:
    """Retrieval -> selection -> geometric verification. Returns accepted edges."""
    n_kf = int(kf_abs.shape[0])
    empty = LoopEdges(
        i=np.zeros(0, np.int64),
        j=np.zeros(0, np.int64),
        rel=np.zeros((0, 4, 4)),
        scale_ok=np.zeros(0, bool),
        n_inliers=np.zeros(0, np.int64),
    )
    if n_kf < cfg.min_gap + 2:
        return empty
    ia, ib = _pair_list(n_kf, cfg.min_gap)
    counts = np.asarray(
        _retrieval_counts(
            feats.desc, feats.valid, jnp.asarray(ia), jnp.asarray(ib), cfg.match_max_distance
        )
    )

    # Greedy host-side selection with near-duplicate suppression.
    order = np.argsort(-counts)
    chosen: list[int] = []
    for p in order:
        if counts[p] < cfg.min_similarity or len(chosen) >= cfg.max_candidates:
            break
        if any(
            abs(int(ia[p]) - int(ia[q])) <= cfg.suppress_radius
            and abs(int(ib[p]) - int(ib[q])) <= cfg.suppress_radius
            for q in chosen
        ):
            continue
        chosen.append(int(p))
    if not chosen:
        return empty
    ca = ia[chosen]
    cb = ib[chosen]

    # Geometric verification: vmapped two-frame VO over the candidates.
    corners = jnp.nan_to_num(jnp.asarray(kf_corners, jnp.float32))
    mvalid = jnp.asarray(kf_marker_present)

    def verify(key, a, b):
        fa = jax.tree_util.tree_map(lambda x: x[a], feats)
        fb = jax.tree_util.tree_map(lambda x: x[b], feats)
        return two_frame_vo(
            key,
            fa,
            fb,
            corners[a],
            corners[b],
            mvalid[a] & mvalid[b],
            K,
            real_marker_length,
            vo_cfg,
        )

    keys = jax.random.split(jax.random.PRNGKey(seed), len(chosen))
    res = jax.jit(jax.vmap(verify))(keys, jnp.asarray(ca), jnp.asarray(cb))

    ok = np.asarray(res.ok) & (np.asarray(res.n_inliers) >= cfg.min_inliers)
    if not ok.any():
        return empty
    ca, cb = ca[ok], cb[ok]
    rel = np.asarray(res.rel, np.float64)[ok]
    rel_unit = np.asarray(res.rel_unit, np.float64)[ok]
    scale_ok = np.asarray(res.scale_ok)[ok]

    # Scale-free edges: set |t| from the current trajectory estimate so the
    # edge constrains rotation + translation direction without fighting the
    # (unknown) metric scale.
    for c in range(len(ca)):
        if not scale_ok[c]:
            implied = np.asarray(
                se3.translation(
                    jnp.asarray(kf_abs[cb[c]]) @ jnp.asarray(np.linalg.inv(kf_abs[ca[c]]))
                )
            )
            rel[c] = rel_unit[c].copy()
            rel[c][:3, 3] *= float(np.linalg.norm(implied))
    return LoopEdges(
        i=ca.astype(np.int64),
        j=cb.astype(np.int64),
        rel=rel,
        scale_ok=scale_ok,
        n_inliers=np.asarray(res.n_inliers)[ok].astype(np.int64),
    )
