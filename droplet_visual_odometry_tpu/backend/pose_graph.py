"""Pose-graph optimisation (loop-closure relinearisation).

NEW vs the reference (SURVEY.md §5). Nodes are keyframe poses, edges are
relative-pose measurements (sequential VO edges + loop-closure edges from
backend/loop_closure.py). Gauss-Newton on the se(3) residual
r_e = log(Z_e^-1 · X_i^-1 · X_j) under left-multiplicative twists
X <- exp(xi) X, with ANALYTIC block Jacobians:

    err(xi) = Z^-1 X_i^-1 exp(xi_j - xi_i) X_j            (first order)
            = err_0 · exp(Adj(X_j^-1)(xi_j - xi_i))
    =>  J_j = Jr^-1(r_0) · Adj(X_j^-1),   J_i = -J_j

with Jr^-1(r) ≈ I + ad(r)/2 (the standard second-order right-Jacobian
inverse). The normal matrix is assembled as (M, M, 6, 6) blocks by
scatter-add over edges — E·4 6x6 block outer products instead of the round-1
dense (E·6, M·6) forward-mode Jacobian, so cost scales with EDGES not
edges x nodes, and the block structure is the unit that a future
sharded-across-hosts solver distributes.

Fixed shapes: edges are padded arrays with a weight mask.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.core import se3


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    iters: int = 10
    damping: float = 1e-6


class PoseGraph(NamedTuple):
    poses: jax.Array  # (M, 4, 4) node poses (world_T_node)
    edge_i: jax.Array  # (E,) int32 source node
    edge_j: jax.Array  # (E,) int32 target node
    edge_meas: jax.Array  # (E, 4, 4) measured node_i_T_node_j
    edge_weight: jax.Array  # (E,) float32 (0 = padding)


class PoseGraphResult(NamedTuple):
    poses: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


def _edge_residuals(poses: jax.Array, graph: PoseGraph) -> jax.Array:
    """(E, 6) unweighted residuals r_e = log(Z^-1 X_i^-1 X_j)."""
    Xi = poses[graph.edge_i]
    Xj = poses[graph.edge_j]
    rel = se3.inverse(Xi) @ Xj
    return se3.se3_log(se3.inverse(graph.edge_meas) @ rel)


def cost(graph: PoseGraph) -> jax.Array:
    r = _edge_residuals(graph.poses, graph)
    w = jnp.maximum(graph.edge_weight, 0.0)
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


def optimize(graph: PoseGraph, cfg: PoseGraphConfig = PoseGraphConfig()) -> PoseGraphResult:
    """Gauss-Newton with the first node held fixed (gauge). Jittable."""
    M = graph.poses.shape[0]
    I6 = jnp.eye(6, dtype=graph.poses.dtype)

    initial = cost(graph)

    def gn_step(_, carry):
        poses, cur_cost = carry
        r = _edge_residuals(poses, graph)  # (E, 6)
        Xj = poses[graph.edge_j]
        Jr_inv = I6 + 0.5 * se3.ad(r)
        Jj = Jr_inv @ se3.adjoint(se3.inverse(Xj))  # (E, 6, 6); Ji = -Jj
        w = jnp.maximum(graph.edge_weight, 0.0)

        # Per-edge normal blocks: with Ji = -Jj, all four H blocks are
        # +-JjT_Jj and the two gradient blocks are -+JjT_r.
        JjT_Jj = w[:, None, None] * (jnp.swapaxes(Jj, -1, -2) @ Jj)
        JjT_r = w[:, None] * jnp.einsum("ekh,ek->eh", Jj, r)

        ei, ej = graph.edge_i, graph.edge_j
        H = jnp.zeros((M, M, 6, 6), poses.dtype)
        H = H.at[ei, ei].add(JjT_Jj)
        H = H.at[ej, ej].add(JjT_Jj)
        H = H.at[ei, ej].add(-JjT_Jj)
        H = H.at[ej, ei].add(-JjT_Jj)
        b = jnp.zeros((M, 6), poses.dtype)
        b = b.at[ei].add(JjT_r)  # -JiT r = +JjT r
        b = b.at[ej].add(-JjT_r)

        Hd = H.transpose(0, 2, 1, 3).reshape(M * 6, M * 6)
        bd = b.reshape(M * 6)
        # Gauge: fix node 0.
        mask = (jnp.arange(M * 6) >= 6).astype(Hd.dtype)
        Hd = Hd * mask[:, None] * mask[None, :]
        Hd = Hd + jnp.diag(jnp.where(mask > 0, cfg.damping, 1.0))
        bd = bd * mask
        dx = jnp.linalg.solve(Hd, bd).reshape(M, 6)
        new_poses = se3.se3_exp(dx) @ poses
        new_cost = cost(graph._replace(poses=new_poses))
        ok = (new_cost < cur_cost) & jnp.isfinite(new_cost)
        poses = jnp.where(ok, new_poses, poses)
        cur_cost = jnp.where(ok, new_cost, cur_cost)
        return poses, cur_cost

    poses, final = jax.lax.fori_loop(0, cfg.iters, gn_step, (graph.poses, initial))
    return PoseGraphResult(poses=poses, initial_cost=initial, final_cost=final)


def sequential_edges(poses: jax.Array, weight: float = 1.0) -> PoseGraph:
    """Build a chain pose graph from (M, 4, 4) poses: edges i -> i+1 with the
    current relative poses as measurements (zero residual by construction —
    loop-closure edges added on top are what create the correction signal)."""
    M = poses.shape[0]
    i = jnp.arange(M - 1, dtype=jnp.int32)
    j = i + 1
    meas = se3.inverse(poses[:-1]) @ poses[1:]
    w = jnp.full((M - 1,), weight, poses.dtype)
    return PoseGraph(poses=poses, edge_i=i, edge_j=j, edge_meas=meas, edge_weight=w)


def add_edges(
    graph: PoseGraph,
    i: jax.Array,
    j: jax.Array,
    meas: jax.Array,
    weight: jax.Array,
) -> PoseGraph:
    """Append (loop-closure) edges."""
    return PoseGraph(
        poses=graph.poses,
        edge_i=jnp.concatenate([graph.edge_i, jnp.asarray(i, jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.asarray(j, jnp.int32)]),
        edge_meas=jnp.concatenate([graph.edge_meas, meas]),
        edge_weight=jnp.concatenate([graph.edge_weight, jnp.asarray(weight, graph.edge_weight.dtype)]),
    )
