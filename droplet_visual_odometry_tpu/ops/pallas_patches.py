"""Pallas TPU kernel: per-keypoint patch extraction as batched async DMAs.

The XLA lowering of vmap(dynamic_slice) over 12k keypoints is a serial HLO
while loop (~20-30 ms at 1080p/24 frames — the dominant cost of the descriptor
stage after its matmul rework), and a flat gather of the same pixels runs at
~70M elem/s (~240 ms). The DMA engines, however, do strided 2-D copies
natively, so each patch is ONE async copy; this kernel issues them in blocks
of B keypoints so B copies are in flight per grid step, hiding DMA latency.

Mosaic constrains HBM memref slices to the (8, 128) tiling, so the copy is an
aligned (48, 256) window around the patch (origin rounded down to the tile
grid); the 37x37 patch is then cut out in VMEM with two dynamic rotates —
lane/sublane rotation by a runtime amount is a native TPU op, unlike dynamic
lane slicing.

Patch origins (frame index + clamped top-left corner) are computed by the
caller and passed as scalar-prefetch operands so the kernel can program the
DMAs before any compute (pallas_guide.md: PrefetchScalarGridSpec). They are
passed as THREE 1-D arrays, not one (M, 3): SMEM pads the minor dimension to
the 128-lane width, so an (M, 3) i32 operand would occupy M*128*4 bytes and
blow the ~1 MB SMEM budget at M=12k (observed on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 37
_B = 16  # keypoints (async DMAs in flight) per grid step
_ROWS = 48  # window rows: covers sublane misalignment 0..7 + 37 rows, 8-aligned
_COLS = 256  # window cols: covers lane misalignment 0..127 + 37 cols, 128-aligned


def _kernel(f_ref, y_ref, x_ref, imgs_hbm, out_ref, scratch, sems, *, block):
    i = pl.program_id(0)

    def dma(b):
        k = i * block + b
        ya = pl.multiple_of(y_ref[k] & ~7, 8)
        xa = pl.multiple_of(x_ref[k] & ~127, 128)
        return pltpu.make_async_copy(
            imgs_hbm.at[f_ref[k], pl.ds(ya, _ROWS), pl.ds(xa, _COLS)],
            scratch.at[b],
            sems.at[b],
        )

    for b in range(block):
        dma(b).start()
    for b in range(block):
        k = i * block + b
        dma(b).wait()
        dy = y_ref[k] & 7
        dx = x_ref[k] & 127
        win = scratch[b]
        win = pltpu.roll(win, _ROWS - dy, axis=0)  # roll left by dy
        win = pltpu.roll(win, _COLS - dx, axis=1)  # roll left by dx
        out_ref[b] = win[:PATCH, :PATCH]


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patches_pallas(
    imgs: jax.Array, origins: jax.Array, interpret: bool = False
) -> jax.Array:
    """(N, H, W) f32 frames + (M, 3) int32 [frame, y0, x0] -> (M, 37, 37) f32.

    Origins must already be clamped to [0, H-PATCH] x [0, W-PATCH] (the caller
    owns the border-clamp semantics, frontend/orb.py:extract_patches).
    """
    imgs = imgs.astype(jnp.float32)
    n, h, w = imgs.shape
    # Pad so every aligned window fits: origin_down + window <= padded extent.
    h_pad = max(-(-h // 8) * 8, ((h - PATCH) // 8) * 8 + _ROWS)
    w_pad = max(-(-w // 128) * 128, ((w - PATCH) // 128) * 128 + _COLS)
    if (h_pad, w_pad) != (h, w):
        imgs = jnp.pad(imgs, ((0, 0), (0, h_pad - h), (0, w_pad - w)))

    m = origins.shape[0]
    block = _B
    m_pad = ((m + block - 1) // block) * block
    if m_pad != m:
        origins = jnp.concatenate(
            [origins, jnp.zeros((m_pad - m, 3), origins.dtype)], axis=0
        )

    origins = origins.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, PATCH, PATCH), lambda i, f, y, x: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block, _ROWS, _COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((block,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, PATCH, PATCH), jnp.float32),
        interpret=interpret,
    )(origins[:, 0], origins[:, 1], origins[:, 2], imgs)
    return out[:m]
