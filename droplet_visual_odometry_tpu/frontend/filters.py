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


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur of (..., H, W) float images (edge-replicated)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    taps = jnp.asarray(_gaussian_taps(float(sigma), radius), img.dtype)

    batch = img.shape[:-2]
    h, w = img.shape[-2], img.shape[-1]
    x = img.reshape((-1, 1, h, w))  # NCHW

    kh = taps.reshape(1, 1, -1, 1)
    kw = taps.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    pad = lambda a, r, axis: jnp.concatenate(
        [jnp.repeat(jnp.take(a, jnp.asarray([0]), axis=axis), r, axis=axis), a,
         jnp.repeat(jnp.take(a, jnp.asarray([a.shape[axis] - 1]), axis=axis), r, axis=axis)],
        axis=axis,
    )
    x = pad(x, radius, 2)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    x = pad(x, radius, 3)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(batch + (h, w))


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
