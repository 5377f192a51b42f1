"""Pose-graph optimisation (loop-closure-style relinearisation).

NEW vs the reference (SURVEY.md §5). Nodes are keyframe poses, edges are
relative-pose measurements (sequential VO edges + any loop-closure edges).
Gauss-Newton on the se(3) residual r_e = log(Z_e^-1 · X_i^-1 · X_j), with the
full Jacobian obtained by forward-mode autodiff of the residual stack w.r.t.
the left-multiplicative twists — exact, and still one fused XLA program since
graphs are small (M <= ~128 nodes dense 6Mx6M solve).

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


def _residuals(xi: jax.Array, graph: PoseGraph) -> jax.Array:
    """(M, 6) twists -> (E, 6) weighted residuals."""
    poses = se3.se3_exp(xi) @ graph.poses
    Xi = poses[graph.edge_i]
    Xj = poses[graph.edge_j]
    rel = se3.inverse(Xi) @ Xj
    err = se3.inverse(graph.edge_meas) @ rel
    r = se3.se3_log(err)
    return r * jnp.sqrt(jnp.maximum(graph.edge_weight, 0.0))[:, None]


def cost(graph: PoseGraph) -> jax.Array:
    xi0 = jnp.zeros((graph.poses.shape[0], 6), graph.poses.dtype)
    r = _residuals(xi0, graph)
    return jnp.sum(r * r)


def optimize(graph: PoseGraph, cfg: PoseGraphConfig = PoseGraphConfig()) -> PoseGraphResult:
    """Gauss-Newton with the first node held fixed (gauge). Jittable."""
    M = graph.poses.shape[0]

    initial = cost(graph)

    def gn_step(_, carry):
        poses, cur_cost = carry
        g = graph._replace(poses=poses)

        def rfun(xi_flat):
            return _residuals(xi_flat.reshape(M, 6), g).reshape(-1)

        xi0 = jnp.zeros(M * 6, poses.dtype)
        J = jax.jacfwd(rfun)(xi0)  # (E*6, M*6)
        r = rfun(xi0)
        H = J.T @ J
        b = -J.T @ r
        # Gauge: fix node 0.
        mask = (jnp.arange(M * 6) >= 6).astype(H.dtype)
        H = H * mask[:, None] * mask[None, :]
        H = H + jnp.diag(jnp.where(mask > 0, cfg.damping, 1.0))
        b = b * mask
        dx = jnp.linalg.solve(H, b).reshape(M, 6)
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
    current relative poses as measurements."""
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
