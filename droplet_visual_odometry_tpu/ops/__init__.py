"""Pallas TPU kernels for the hot ops + backend selection.

Kernels (each with an XLA twin in frontend/ for CPU/debug):
  pallas_fast.fast_score_pallas    fused FAST corner response (bandwidth-bound)
  pallas_match.match_reductions    fused Hamming distance + all match reductions

Selection: `pallas_enabled()` is consulted at trace time — Pallas on a real
TPU backend, XLA elsewhere (the CPU test mesh runs kernels through the Pallas
interpreter only in the dedicated equivalence tests, where speed is not the
point). Override with `set_pallas(True/False)` or DVO_FORCE_PALLAS=0/1.
"""

from __future__ import annotations

import os

import jax

_FORCE: bool | None = None
_env = os.environ.get("DVO_FORCE_PALLAS")
if _env is not None:
    _FORCE = _env not in ("0", "false", "False")


def set_pallas(enabled: bool | None) -> None:
    """Force Pallas kernels on/off; None restores backend auto-detection."""
    global _FORCE
    _FORCE = enabled


def pallas_enabled() -> bool:
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas interpreter is required on non-TPU backends."""
    return jax.default_backend() != "tpu"


# The fused match kernel passes the interpreter equivalence suite and compiles
# for TPU, but on the single-chip axon tunnel its first execution was observed
# to wedge the device (runtime hang, not a compile error) — so it stays opt-in
# until that is root-caused. The XLA matcher is already one MXU matmul + small
# reductions, so the fusion win is minor at K=512.
_MATCH_KERNEL = os.environ.get("DVO_PALLAS_MATCH", "0") not in ("0", "false", "False")


def pallas_match_enabled() -> bool:
    return _MATCH_KERNEL or _FORCE is True


# Per-keypoint patch extraction as batched async DMAs (ops/pallas_patches.py).
# Replaces the serial vmap(dynamic_slice) HLO loop in the descriptor stage.
_PATCH_KERNEL_ENV = os.environ.get("DVO_PALLAS_PATCHES")


def pallas_patches_enabled() -> bool:
    if _PATCH_KERNEL_ENV is not None:
        return _PATCH_KERNEL_ENV not in ("0", "false", "False")
    return pallas_enabled()
