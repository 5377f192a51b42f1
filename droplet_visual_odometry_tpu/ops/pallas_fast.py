"""Pallas TPU kernel: fused FAST-N corner response.

The XLA implementation (frontend/fast.py:fast_score) materialises a
(16, H, W) stack of shifted images plus brighter/darker masks — at the
reference's 1440x1080 resolution (camera_calibration.yaml:22-23) that is
hundreds of MB of HBM traffic per frame. This kernel streams the image through
VMEM once per row-tile: the 16 Bresenham-circle neighbours are static row
slices of a 3-row halo (y) and in-register lane rolls (x), the doubled-ring
contiguous-arc scan and the score accumulation run entirely on the VPU, and
only the final (H, W) score map is written back. HBM traffic drops to
read-once + write-once — the bandwidth speed-of-light for this op.

Grid: one program per TILE_H-row stripe. The input lives in HBM/ANY; each
program DMAs its stripe + halo into VMEM scratch (per pallas_guide.md async
DMA pattern). x-wraparound from the lane roll only corrupts a 3-pixel border
that the FAST border mask excludes anyway (same argument as fast.py:30-38).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from droplet_visual_odometry_tpu.frontend.fast import BORDER, CIRCLE_OFFSETS

TILE_H = 64  # 128-row tiles blow the 16MB scoped-VMEM budget at W=1536 (unrolled scan live set)
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


HALO = 8  # halo rows each side; 8-row aligned so the DMA slice tiles cleanly


def _kernel(img_ref, out_ref, scratch, sem, *, tile_h, w_pad, h_orig, w_orig, threshold, arc_length):
    n = pl.program_id(0)  # frame index (batch grid dim; 1 for single frames)
    i = pl.program_id(1)
    row0 = i * tile_h
    # img_ref holds HALO extra rows top+bottom: stripe rows [row0, row0+tile_h)
    # of the output need padded rows [row0, row0 + tile_h + 2*HALO). Both the
    # start (multiple of tile_h) and length are 8-row aligned — a Mosaic
    # requirement for VMEM memref slices (sublane tiling).
    dma = pltpu.make_async_copy(
        img_ref.at[n, pl.ds(pl.multiple_of(row0, tile_h), tile_h + 2 * HALO)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    center = scratch[HALO : HALO + tile_h, :]

    def neighbour(j):
        dy, dx = CIRCLE_OFFSETS[j]
        rows = scratch[HALO + dy : HALO + dy + tile_h, :]
        return pltpu.roll(rows, (-dx) % w_pad, axis=1)

    zeros_i = jnp.zeros((tile_h, w_pad), jnp.int32)
    zeros_f = jnp.zeros((tile_h, w_pad), jnp.float32)
    run_b = zeros_i
    best_b = zeros_i
    run_d = zeros_i
    best_d = zeros_i
    score_b = zeros_f
    score_d = zeros_f
    # Doubled-ring scan (fast.py:41-54) fused with score accumulation: steps
    # 0..15 accumulate the polarity scores, all 32 steps advance the run scan.
    for step in range(32):
        nbr = neighbour(step % 16)
        brighter = nbr > center + threshold
        darker = nbr < center - threshold
        run_b = jnp.where(brighter, run_b + 1, 0)
        run_d = jnp.where(darker, run_d + 1, 0)
        best_b = jnp.maximum(best_b, jnp.minimum(run_b, 16))
        best_d = jnp.maximum(best_d, jnp.minimum(run_d, 16))
        if step < 16:
            excess = jnp.abs(nbr - center) - threshold
            score_b = score_b + jnp.where(brighter, excess, 0.0)
            score_d = score_d + jnp.where(darker, excess, 0.0)

    is_corner = (best_b >= arc_length) | (best_d >= arc_length)
    score = jnp.maximum(score_b, score_d)

    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 0) + row0
    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)
    in_bounds = (
        (yy >= BORDER)
        & (yy < h_orig - BORDER)
        & (xx >= BORDER)
        & (xx < w_orig - BORDER)
    )
    out_ref[0] = jnp.where(is_corner & in_bounds, score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("threshold", "arc_length", "tile_h", "interpret")
)
def fast_score_pallas_batch(
    imgs: jax.Array,
    threshold: float = 20.0,
    arc_length: int = 9,
    tile_h: int = TILE_H,
    interpret: bool = False,
) -> jax.Array:
    """Batched corner response: (N, H, W) float -> (N, H, W) float32.

    The batch rides as the leading grid dimension (one program per frame per
    row stripe), so whole-sequence frontends issue ONE kernel launch.
    """
    imgs = imgs.astype(jnp.float32)
    n, h, w = imgs.shape
    h_pad = _round_up(h, tile_h)
    w_pad = _round_up(w, LANE)
    # Edge-replicate pad to tile multiples + HALO rows top/bottom.
    padded = jnp.pad(
        imgs, ((0, 0), (HALO, h_pad - h + HALO), (0, w_pad - w)), mode="edge"
    )
    grid = (n, h_pad // tile_h)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            tile_h=tile_h,
            w_pad=w_pad,
            h_orig=h,
            w_orig=w,
            threshold=float(threshold),
            arc_length=int(arc_length),
        ),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_pad), lambda ni, i: (ni, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return out[:, :h, :w]


def fast_score_pallas(
    img: jax.Array,
    threshold: float = 20.0,
    arc_length: int = 9,
    tile_h: int = TILE_H,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for frontend.fast.fast_score, bit-matching its semantics.

    (H, W) float -> (H, W) float32 corner response (0 for non-corners).
    """
    return fast_score_pallas_batch(
        img[None], threshold, arc_length, tile_h, interpret
    )[0]
