"""Image filtering primitives: separable Gaussian blur and image pyramid.

XLA convolutions map directly onto the TPU convolution units; separable 1-D
passes keep the arithmetic intensity low-rank (2*k taps instead of k^2).
Replaces the pyramid hidden inside cv.ORB_create's detectAndCompute
(reference: visual_odometry_v3.py:96, 373).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _gaussian_taps(sigma: float, radius: int) -> tuple[float, ...]:
    xs = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
    s = sum(xs)
    return tuple(x / s for x in xs)


def _pad_replicate(a: jax.Array, r: int, axis: int) -> jax.Array:
    first = jnp.take(a, jnp.asarray([0]), axis=axis)
    last = jnp.take(a, jnp.asarray([a.shape[axis] - 1]), axis=axis)
    return jnp.concatenate(
        [jnp.repeat(first, r, axis=axis), a, jnp.repeat(last, r, axis=axis)], axis=axis
    )


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur of (..., H, W) float images (edge-replicated).

    Implemented as shift-and-add (2*(2r+1) scaled slice-adds on the VPU), NOT
    as lax.conv: a single-channel conv cannot feed the MXU's 128x128 systolic
    array and measured ~40 ms/frame at 1080p on v5e — the shift form is pure
    elementwise bandwidth, ~100x faster.
    """
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    taps = _gaussian_taps(float(sigma), radius)

    h, w = img.shape[-2], img.shape[-1]
    x = _pad_replicate(img, radius, img.ndim - 2)
    acc = None
    for i, t in enumerate(taps):
        sl = jax.lax.slice_in_dim(x, i, i + h, axis=img.ndim - 2) * t
        acc = sl if acc is None else acc + sl
    x = _pad_replicate(acc, radius, img.ndim - 1)
    acc = None
    for i, t in enumerate(taps):
        sl = jax.lax.slice_in_dim(x, i, i + w, axis=img.ndim - 1) * t
        acc = sl if acc is None else acc + sl
    return acc


def resize_bilinear(img: jax.Array, new_h: int, new_w: int) -> jax.Array:
    """Antialiased linear resize of (..., H, W) to (..., new_h, new_w).

    jax.image.resize(linear, antialias) lowers to two separable weight
    matmuls (one per spatial axis) — MXU work, not gathers — which is the
    right TPU shape for the pyramid's non-integer scale steps (e.g. 1/sqrt(2))."""
    shape = img.shape[:-2] + (new_h, new_w)
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear")


def downsample2(img: jax.Array) -> jax.Array:
    """Blur + 2x decimate one pyramid step for (..., H, W)."""
    b = gaussian_blur(img, sigma=1.0, radius=2)
    return b[..., ::2, ::2]


def build_pyramid(img: jax.Array, n_levels: int) -> list[jax.Array]:
    """Power-of-two Gaussian pyramid: [level0 (full res), level1 (H/2), ...]."""
    out = [img]
    for _ in range(n_levels - 1):
        out.append(downsample2(out[-1]))
    return out
