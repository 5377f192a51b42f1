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
from droplet_visual_odometry_tpu.frontend.orb import (
    Features,
    HALF,
    describe,
    describe_batch,
)


@functools.partial(jax.jit, static_argnames=("k", "threshold", "arc_length", "mode", "dog_threshold"))
def detect_and_describe(
    img: jax.Array,
    k: int = 512,
    threshold: float = 20.0,
    arc_length: int = 9,
    mode: str = "orb",
    dog_threshold: float = 1.0,
) -> Features:
    """(H, W) uint8/float frame -> fixed-K Features.

    mode selects the frontend family (the reference's mode switch,
    v3:93-107): 'orb' — FAST + 256-bit binary descriptors (Hamming matching);
    'sift' — DoG blobs + 128-d float gradient histograms (L2 matching,
    frontend/sift.py). Keypoints closer than the descriptor-patch half-width
    to the border are invalidated (their clamped patches would alias the
    border).
    """
    if mode == "sift":
        from droplet_visual_odometry_tpu.frontend import sift

        return sift.detect_and_describe(img, k=k, threshold=dog_threshold)
    if mode != "orb":
        raise ValueError(f"unknown frontend mode: {mode}")
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


@functools.partial(jax.jit, static_argnames=("k", "threshold", "arc_length", "mode", "dog_threshold"))
def detect_and_describe_batch(
    imgs: jax.Array,
    k: int = 512,
    threshold: float = 20.0,
    arc_length: int = 9,
    mode: str = "orb",
    dog_threshold: float = 1.0,
) -> Features:
    """(N, H, W) frames -> Features with leading N axis.

    Natively batched (not a plain vmap of the single-frame path): the corner
    response is ONE Pallas launch over an (N, rows) grid on TPU, the blur is
    one batched shift-and-add, and only the small per-keypoint stages
    (top-k, patch gather, descriptor) are vmapped. Whole-sequence frontends
    therefore amortise kernel-launch and fusion overhead across frames —
    results are identical to mapping detect_and_describe frame by frame.
    """
    if mode == "sift":
        from droplet_visual_odometry_tpu.frontend import sift

        return jax.vmap(
            functools.partial(sift.detect_and_describe, k=k, threshold=dog_threshold)
        )(imgs)
    if mode != "orb":
        raise ValueError(f"unknown frontend mode: {mode}")

    from droplet_visual_odometry_tpu import ops

    imgs = imgs.astype(jnp.float32)
    if ops.pallas_enabled():
        from droplet_visual_odometry_tpu.ops.pallas_fast import fast_score_pallas_batch

        score = fast_score_pallas_batch(
            imgs, threshold, arc_length, interpret=ops.interpret_mode()
        )
    else:
        score = jax.vmap(lambda f: fast.fast_score(f, threshold, arc_length))(imgs)
    kps = jax.vmap(lambda s: fast.select_topk_tiled(fast.nms3x3(s), k))(score)
    blur = filters.gaussian_blur(imgs, sigma=2.0, radius=4)
    desc, ang = describe_batch(blur, kps.xy)

    h, w = imgs.shape[-2:]
    x, y = kps.xy[..., 0], kps.xy[..., 1]
    interior = (x >= HALF) & (x < w - HALF) & (y >= HALF) & (y < h - HALF)
    return Features(
        xy=kps.xy, score=kps.score, angle=ang, desc=desc, valid=kps.valid & interior
    )
