"""Pallas TPU kernel: fused Hamming-distance matching.

The XLA path (frontend/matcher.py) runs unpack -> MXU matmul -> three separate
reductions (row argmin, row second-best, column argmin), each of which can
round-trip the (K, K) distance matrix through HBM. This kernel keeps the
distance matrix in VMEM for its whole life: one MXU matmul of the +-1-expanded
descriptors (dot(a,b) = 256 - 2*hamming, exact — orb.py:145-155) followed by
all reductions in-register, emitting only four K-vectors. For the reference's
K=512 budget (cv.ORB_create default, v3:96) the distance matrix is 1 MB — far
under the ~16 MB VMEM budget, so a single-program kernel is the bandwidth
optimum; larger K would tile over columns.

The rhs is fed pre-transposed ((256, Kb), standard MXU contraction) and the
+-1 expansion is f32: 512 256-deep dot products are ~67 MFLOP, noise on the
MXU, and f32 keeps Mosaic's operand constraints trivially satisfied.

Output layout: (8, K) float32 —
  row 0: best column distance per row      (query -> train nearest)
  row 1: best column index per row
  row 2: second-best column distance       (for the Lowe ratio test, v3:223-230)
  row 3: best row index per column         (for mutual cross-check, v3:75)
rows 4-7 pad to the f32 sublane tile (pallas_guide.md tiling constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from droplet_visual_odometry_tpu.frontend.orb import N_BITS, unpack_bits_pm1

BIG = 1e9  # invalid-entry distance offset (python float: jnp constants would
#            be captured tracers in the kernel)
BIG2 = 3e9  # masks the best column out when finding the second-best


def _kernel(a_ref, bt_ref, va_ref, vb_ref, out_ref):
    dot = jnp.dot(a_ref[:], bt_ref[:], preferred_element_type=jnp.float32)
    dist = 0.5 * (N_BITS - dot)
    va = va_ref[0, :]  # (Ka,) 1.0 valid / 0.0 invalid
    vb = vb_ref[0, :]
    dist = dist + (1.0 - va)[:, None] * BIG + (1.0 - vb)[None, :] * BIG

    d1 = jnp.min(dist, axis=1)
    i1 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(cols == i1[:, None], BIG2, dist)
    d2 = jnp.min(masked, axis=1)
    col_best = jnp.argmin(dist, axis=0).astype(jnp.int32)

    zeros = jnp.zeros_like(d1)
    out_ref[:] = jnp.stack(
        [d1, i1.astype(jnp.float32), d2, col_best.astype(jnp.float32)]
        + [zeros] * 4,
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_reductions(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(Ka, 8) x (Kb, 8) packed descriptors -> (d1, i1, d2, col_best).

    Requires Ka == Kb (the fixed per-frame budget makes this always true in
    the pipeline). Invalid descriptors get distance >= BIG.
    """
    ka = desc_a.shape[0]
    kb = desc_b.shape[0]
    if ka != kb:
        raise ValueError(f"fused matcher requires Ka == Kb, got {ka} != {kb}")
    a = unpack_bits_pm1(desc_a, dtype=jnp.float32)
    bt = unpack_bits_pm1(desc_b, dtype=jnp.float32).T
    va = valid_a.astype(jnp.float32).reshape(1, ka)
    vb = valid_b.astype(jnp.float32).reshape(1, kb)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, ka), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, bt, va, vb)
    d1 = out[0]
    i1 = out[1].astype(jnp.int32)
    d2 = out[2]
    col_best = out[3].astype(jnp.int32)
    return d1, i1, d2, col_best
