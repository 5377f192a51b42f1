"""Per-frame feature extraction: detect + orient + describe in one jittable call.

The analog of the reference's compute_current_image_elements
(visual_odometry_v3.py:370-379) — but batched, fixed-shape, and computed ONCE
per frame (the reference re-detects every frame twice per pair since pairs
overlap, v3:387-392; our sequence pipeline carries features forward instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.frontend import fast, filters
from droplet_visual_odometry_tpu.frontend.orb import Features, HALF, describe


@functools.partial(jax.jit, static_argnames=("k", "threshold", "arc_length"))
def detect_and_describe(
    img: jax.Array,
    k: int = 512,
    threshold: float = 20.0,
    arc_length: int = 9,
) -> Features:
    """(H, W) uint8/float frame -> fixed-K Features.

    Keypoints closer than the descriptor-patch half-width to the border are
    invalidated (their clamped patches would alias the border).
    """
    img = img.astype(jnp.float32)
    kps = fast.detect(img, k=k, threshold=threshold, arc_length=arc_length)
    blur = filters.gaussian_blur(img, sigma=2.0, radius=4)
    desc, ang = describe(blur, kps)

    h, w = img.shape
    x, y = kps.xy[:, 0], kps.xy[:, 1]
    interior = (x >= HALF) & (x < w - HALF) & (y >= HALF) & (y < h - HALF)
    return Features(
        xy=kps.xy, score=kps.score, angle=ang, desc=desc, valid=kps.valid & interior
    )


def detect_and_describe_batch(
    imgs: jax.Array, k: int = 512, threshold: float = 20.0, arc_length: int = 9
) -> Features:
    """(N, H, W) frames -> Features with leading N axis (vmapped)."""
    fn = functools.partial(
        detect_and_describe, k=k, threshold=threshold, arc_length=arc_length
    )
    return jax.vmap(fn)(imgs)
