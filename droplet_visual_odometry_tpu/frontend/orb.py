"""Rotation-aware binary (rBRIEF-style) descriptors, fully batched for TPU.

Replaces the descriptor half of cv.ORB_create().detectAndCompute
(reference: visual_odometry_v3.py:96, 370-379). Design:

  * Orientation by intensity centroid (the ORB method): patch moments m01/m10
    computed from gathered per-keypoint patches in one batched reduction.
  * Descriptor: 256 pixel-pair comparisons on a sigma~2 blurred image. The
    sampling pattern is OUR OWN deterministic pattern (seeded Gaussian pairs as
    in the original BRIEF paper) — not OpenCV's learned table — since both
    sides of every match use the same pattern, the choice only needs to be
    spread-out and fixed.
  * Steering: the pattern is pre-rotated into ANGLE_BINS discrete orientations
    (OpenCV quantises to 12 degrees as well); each keypoint selects its bin and
    gathers 512 pixels from its patch -> 256 comparisons -> bit-packed into
    8 uint32 words.

Everything is fixed-shape: K keypoints in, (K, 8) uint32 descriptors out, with
a validity mask. vmap over frames for batches; gathers are the only
non-elementwise ops and XLA lowers them to efficient TPU dynamic-gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.frontend.fast import Keypoints

N_BITS = 256
N_WORDS = N_BITS // 32
PATCH = 37  # patch side; supports rotated samples with radius <= 18
HALF = PATCH // 2
PATTERN_RADIUS = 13  # max sample offset magnitude before rotation
ANGLE_BINS = 30  # 12-degree quantisation


def _make_pattern(seed: int = 7) -> np.ndarray:
    """(256, 2, 2) int offsets (dy, dx) for the two test points of each bit.

    Gaussian-distributed offsets (BRIEF-II style), clipped to the pattern
    radius, deterministic. Module-level constant.
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=PATTERN_RADIUS / 2.0, size=(N_BITS, 2, 2))
    return np.clip(np.round(pts), -PATTERN_RADIUS, PATTERN_RADIUS).astype(np.int32)


_PATTERN = _make_pattern()


def _rotated_pattern_indices() -> np.ndarray:
    """Pre-rotate the pattern into ANGLE_BINS orientations and flatten to patch
    indices: (ANGLE_BINS, 512) int32 indices into a PATCH*PATCH patch."""
    out = np.empty((ANGLE_BINS, N_BITS * 2), np.int32)
    for b in range(ANGLE_BINS):
        a = 2.0 * np.pi * b / ANGLE_BINS
        c, s = np.cos(a), np.sin(a)
        # offsets are (dy, dx); rotate in image coords
        dy = _PATTERN[..., 0]
        dx = _PATTERN[..., 1]
        ry = np.round(s * dx + c * dy).astype(np.int32)
        rx = np.round(c * dx - s * dy).astype(np.int32)
        ry = np.clip(ry, -HALF, HALF) + HALF
        rx = np.clip(rx, -HALF, HALF) + HALF
        out[b] = (ry * PATCH + rx).reshape(-1)
    return out


_ROT_INDICES = jnp.asarray(_rotated_pattern_indices())


def extract_patches(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Gather (K, PATCH, PATCH) patches centred on integer-rounded keypoints.

    Keypoints near the border are clamped so the patch stays in-bounds (their
    descriptors are still produced; callers should prefer masking borderline
    keypoints out with Features.valid for matching quality).
    """
    h, w = img.shape
    ij = jnp.stack([xy[:, 1], xy[:, 0]], axis=-1)  # (K, 2) row, col
    ij = jnp.round(ij).astype(jnp.int32) - HALF
    ij = jnp.clip(ij, 0, jnp.asarray([h - PATCH, w - PATCH]))

    def one(start):
        return jax.lax.dynamic_slice(img, (start[0], start[1]), (PATCH, PATCH))

    return jax.vmap(one)(ij)


def orientation(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle per patch: atan2(m01, m10) over a centred disc."""
    dy = jnp.arange(PATCH, dtype=jnp.float32) - HALF
    dx = jnp.arange(PATCH, dtype=jnp.float32) - HALF
    yy, xx = jnp.meshgrid(dy, dx, indexing="ij")
    disc = (yy * yy + xx * xx) <= (HALF * HALF)
    wy = jnp.where(disc, yy, 0.0)
    wx = jnp.where(disc, xx, 0.0)
    m01 = jnp.einsum("khw,hw->k", patches, wy)
    m10 = jnp.einsum("khw,hw->k", patches, wx)
    return jnp.arctan2(m01, m10)


def describe(
    img_blur: jax.Array, kps: Keypoints
) -> tuple[jax.Array, jax.Array]:
    """Compute (K, 8) uint32 packed descriptors + (K,) angle for keypoints.

    `img_blur` must already be Gaussian-blurred (sigma~2) — done once per frame
    by the caller so the blur amortises over all keypoints.
    """
    patches = extract_patches(img_blur, kps.xy)
    ang = orientation(patches)

    # Quantise angle to a pattern bin.
    two_pi = 2.0 * jnp.pi
    bin_idx = jnp.mod(jnp.round(ang / two_pi * ANGLE_BINS), ANGLE_BINS).astype(jnp.int32)

    flat = patches.reshape(patches.shape[0], PATCH * PATCH)
    sample_idx = _ROT_INDICES[bin_idx]  # (K, 512)
    samples = jnp.take_along_axis(flat, sample_idx, axis=1)  # (K, 512)
    p1 = samples[:, 0::2]
    p2 = samples[:, 1::2]
    bits = (p1 < p2).astype(jnp.uint32)  # (K, 256)

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(-1, N_WORDS, 32) << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32), ang


class Features(NamedTuple):
    """Per-frame fixed-K feature set — the unit the matcher consumes."""

    xy: jax.Array  # (K, 2) float32
    score: jax.Array  # (K,)
    angle: jax.Array  # (K,)
    desc: jax.Array  # (K, 8) uint32 packed 256-bit descriptors
    valid: jax.Array  # (K,) bool


def unpack_bits_pm1(desc: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(K, 8) uint32 -> (K, 256) in {-1, +1}.

    The +-1 expansion turns Hamming distance into an MXU matmul:
    dot(a, b) = 256 - 2*hamming(a, b). Products of +-1 are exact in bf16 and
    accumulate in f32 on the MXU, so this path is bit-exact and speed-of-light.
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[:-1] + (N_BITS,))
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)
