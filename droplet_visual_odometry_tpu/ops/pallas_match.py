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

Kernel-hygiene choices (all reductions are plain `min`, the simplest VPU op):
  * no argmin — the winning index rides along inside the minimised value:
    Hamming distances are integers in [0, 256] (invalid entries get 512), so
    `enc = dist * 4096 + index` is exactly representable in f32
    (max 512*4096+4095 < 2^24) and min(enc) simultaneously yields the best
    distance (enc // 4096) and its index (enc mod 4096);
  * the rhs is fed pre-transposed ((256, Kb), standard MXU contraction) and
    the +-1 expansion is f32 — 512x512x256 is ~67 MFLOP, noise on the MXU.

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

BIG = 1e9  # invalid-entry distance reported to callers (matcher.BIG parity)
_INVALID = 512.0  # in-kernel invalid distance; keeps enc inside f32 integers
_ENC = 4096.0  # index stride in the (dist, index) packing; requires K <= 4096
MAX_K = 4096


def _kernel(a_ref, bt_ref, va_ref, vb_ref, out_ref):
    dot = jnp.dot(a_ref[:], bt_ref[:], preferred_element_type=jnp.float32)
    dist = 0.5 * (N_BITS - dot)
    va = va_ref[0, :]  # (Ka,) 1.0 valid / 0.0 invalid
    vb = vb_ref[0, :]
    invalid = (1.0 - va)[:, None] + (1.0 - vb)[None, :]
    dist = jnp.where(invalid > 0.0, _INVALID, dist)

    ka, kb = dist.shape
    # Mosaic's tpu.iota is integer-only (f32 iota fails verification — this
    # was the round-1 "wedge": the axon tunnel surfaced the lowering failure
    # as a runtime hang instead of an error). Generate i32, then convert.
    cols = jax.lax.broadcasted_iota(jnp.int32, (ka, kb), 1).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ka, kb), 0).astype(jnp.float32)

    enc_row = dist * _ENC + cols  # min over axis 1 -> best (dist, col) per row
    best_row = jnp.min(enc_row, axis=1)
    d1 = jnp.floor(best_row / _ENC)
    i1 = best_row - d1 * _ENC

    # Second best: lift the winning column out of contention, min again.
    enc_row2 = jnp.where(cols == i1[:, None], _INVALID * 2.0 * _ENC, enc_row)
    best_row2 = jnp.min(enc_row2, axis=1)
    d2 = jnp.floor(best_row2 / _ENC)

    enc_col = dist * _ENC + rows  # min over axis 0 -> best row per column
    best_col = jnp.min(enc_col, axis=0)
    dc = jnp.floor(best_col / _ENC)
    col_best = best_col - dc * _ENC

    zeros = jnp.zeros_like(d1)
    out_ref[:] = jnp.stack([d1, i1, d2, col_best] + [zeros] * 4, axis=0)


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
    the pipeline). Invalid descriptors report distance >= BIG, matching the
    XLA matcher's convention.
    """
    ka = desc_a.shape[0]
    kb = desc_b.shape[0]
    if ka != kb:
        raise ValueError(f"fused matcher requires Ka == Kb, got {ka} != {kb}")
    if ka > MAX_K:
        raise ValueError(f"fused matcher supports K <= {MAX_K}, got {ka}")
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
    # Report invalid entries as >= BIG like the XLA matcher.
    d1 = jnp.where(out[0] >= _INVALID, BIG, out[0])
    i1 = out[1].astype(jnp.int32)
    d2 = jnp.where(out[2] >= _INVALID, BIG, out[2])
    col_best = out[3].astype(jnp.int32)
    return d1, i1, d2, col_best
