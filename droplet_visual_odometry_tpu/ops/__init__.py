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


# The fused match kernel: round-1's "first execution wedges the device" is
# root-caused. The kernel contained `broadcasted_iota(jnp.float32, ...)`,
# which fails Mosaic verification ('tpu.iota' op result must be integer) —
# the axon tunnel surfaced that lowering failure as a runtime hang instead of
# an error. Fixed (i32 iota + convert, pallas_match.py); the fix is pinned by
# a cross-platform TPU-lowering regression test that runs on the CPU host
# (tests/test_ops_pallas.py::test_match_kernel_lowers_for_tpu) plus the
# interpreter bit-equivalence suite.
#
# Disposition (round 4, MEASURED — tools/aot_match_bench.py on the real
# chip, AOT lower/compile/execute with dispatch overhead cancelled via
# in-program fori_loop deltas): XLA 10.9 / 19.0 / 48.7 us-per-match at
# K=512/1024/2048 vs Pallas 10.8 / 28.8 / COMPILE-FAILURE (the (K, K) f32
# distance matrix overflows VMEM at 2048). The fused kernel ties at the
# production K=512 and loses beyond it, so the XLA matcher is the DEFAULT
# on every backend; the kernel remains available via DVO_PALLAS_MATCH=1
# (or set_pallas(True)) as a building block should a tiled variant make it
# worthwhile. This replaces round 3's unmeasured default-on for directly
# attached TPUs. Numbers committed in PERF.md.
_MATCH_KERNEL_ENV = os.environ.get("DVO_PALLAS_MATCH")


def _tunneled_tpu() -> bool:
    """True when the TPU is reached through the axon tunnel (remote PJRT
    proxy) rather than directly attached.

    FAIL SAFE (advisor r3): running the fused match kernel's dispatch path on
    the tunnel can wedge the shared runtime persistently across processes, so
    any failure to POSITIVELY identify a directly-attached device is treated
    as tunneled (kernel stays opt-in). Direct attachment is identified by a
    platform_version that names the TPU runtime without any tunnel/proxy
    marker; an unreadable or unrecognisable version string is NOT direct."""
    try:
        dev = jax.devices()[0]
        version = getattr(dev.client, "platform_version", "") or ""
    except Exception:
        return True  # can't inspect the device -> assume tunneled
    v = version.lower()
    if "axon" in v or "proxy" in v or "ifrt" in v:
        return True  # known tunnel/remote-runtime markers
    # Positive direct-attachment evidence: a local TPU runtime identifies
    # itself (libtpu / TFRT TPU) with no tunnel marker above.
    return not ("tpu" in v and ("libtpu" in v or "tfrt" in v))


def pallas_match_enabled() -> bool:
    if _FORCE is True:
        return True
    if _MATCH_KERNEL_ENV is not None:
        enabled = _MATCH_KERNEL_ENV not in ("0", "false", "False")
        if enabled and jax.default_backend() == "tpu" and _tunneled_tpu():
            # Tunnel-wedge guard stays armed even for the manual opt-in
            # (advisor r4): dispatching the fused kernel over the tunnel can
            # wedge the shared runtime for every process.
            return False
        return enabled
    return False  # measured: XLA matcher >= fused kernel at every K (above)


# Per-keypoint patch extraction as batched async DMAs (ops/pallas_patches.py).
# Replaces the serial vmap(dynamic_slice) HLO loop in the descriptor stage.
_PATCH_KERNEL_ENV = os.environ.get("DVO_PALLAS_PATCHES")


def pallas_patches_enabled() -> bool:
    if _PATCH_KERNEL_ENV is not None:
        return _PATCH_KERNEL_ENV not in ("0", "false", "False")
    return pallas_enabled()
