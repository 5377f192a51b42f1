"""Pallas kernels vs their XLA twins — bit-level equivalence on the CPU
interpreter (the real-TPU path compiles the same kernel code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droplet_visual_odometry_tpu import ops
from droplet_visual_odometry_tpu.frontend import fast, matcher
from droplet_visual_odometry_tpu.ops.pallas_fast import fast_score_pallas
from droplet_visual_odometry_tpu.ops.pallas_match import match_reductions


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish image with injected corners so FAST fires.
    img = rng.uniform(0, 60, size=(h, w)).astype(np.float32)
    for y, x in rng.integers(10, [h - 10, w - 10], size=(25, 2)):
        img[y : y + 4, x : x + 4] += 150.0
    return img


@pytest.mark.parametrize("shape", [(96, 128), (100, 130), (240, 320)])
def test_fast_score_pallas_matches_xla(shape):
    img = jnp.asarray(_image(*shape))
    ref = np.asarray(fast.fast_score(img, 20.0, 9))
    out = np.asarray(fast_score_pallas(img, 20.0, 9, tile_h=32, interpret=True))
    assert out.shape == ref.shape
    # Same corner set...
    np.testing.assert_array_equal(out > 0, ref > 0)
    # ...and same response up to summation-order float error.
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_fast_score_pallas_arc_and_threshold_params():
    img = jnp.asarray(_image(64, 128, seed=3))
    for thr, arc in [(10.0, 12), (35.0, 9)]:
        ref = np.asarray(fast.fast_score(img, thr, arc))
        out = np.asarray(fast_score_pallas(img, thr, arc, tile_h=32, interpret=True))
        np.testing.assert_array_equal(out > 0, ref > 0)


def _descriptors(k, seed=0):
    rng = np.random.default_rng(seed)
    desc = rng.integers(0, 2**32, size=(k, 8), dtype=np.uint32)
    valid = rng.uniform(size=k) > 0.2
    return jnp.asarray(desc), jnp.asarray(valid)


def test_match_reductions_vs_xla():
    da, va = _descriptors(128, 0)
    db, vb = _descriptors(128, 1)
    dist = matcher.hamming_matrix(da, db, va, vb)
    d1, i1, d2, col_best = match_reductions(da, db, va, vb, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(jnp.argmin(dist, axis=1)))
    # Valid rows match exactly; invalid rows just need to stay >= BIG (the XLA
    # path sets exactly BIG, the kernel adds BIG to the true distance).
    ok = np.asarray(d1) < matcher.BIG
    np.testing.assert_allclose(
        np.asarray(d1)[ok], np.asarray(jnp.min(dist, axis=1))[ok]
    )
    assert np.all(np.asarray(d1)[~ok] >= float(matcher.BIG))
    np.testing.assert_array_equal(
        np.asarray(col_best), np.asarray(jnp.argmin(dist, axis=0))
    )
    # Second-best: mask the best column out, then min (valid rows only).
    cols = np.arange(128)
    dn = np.asarray(dist).copy()
    dn[cols, np.asarray(i1)] = np.inf
    ok2 = dn.min(axis=1) < matcher.BIG
    np.testing.assert_allclose(np.asarray(d2)[ok2], dn.min(axis=1)[ok2])


@pytest.mark.parametrize("mode", ["crosscheck", "ratio"])
def test_full_match_pallas_equals_xla(mode):
    da, va = _descriptors(128, 2)
    db, vb = _descriptors(128, 3)
    ref = matcher.match(da, db, va, vb, mode=mode)
    ops.set_pallas(True)
    try:
        out = matcher.match(da, db, va, vb, mode=mode)
    finally:
        ops.set_pallas(None)
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    sel = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(out.idx)[sel], np.asarray(ref.idx)[sel])
    np.testing.assert_allclose(
        np.asarray(out.distance)[sel], np.asarray(ref.distance)[sel]
    )


def test_detect_pallas_path_equals_xla():
    img = jnp.asarray(_image(96, 128, seed=5))
    ref = fast.detect(img, k=64)
    ops.set_pallas(True)
    try:
        out = fast.detect(img, k=64)
    finally:
        ops.set_pallas(None)
    sel = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(out.valid), sel)
    np.testing.assert_allclose(np.asarray(out.xy)[sel], np.asarray(ref.xy)[sel])


def test_backend_auto_detection():
    assert jax.default_backend() == "cpu"
    assert not ops.pallas_enabled()  # auto: off on CPU
    ops.set_pallas(True)
    assert ops.pallas_enabled()
    ops.set_pallas(None)
    assert ops.interpret_mode()


def test_extract_patches_pallas_matches_xla():
    from droplet_visual_odometry_tpu.frontend import orb
    from droplet_visual_odometry_tpu.ops.pallas_patches import (
        PATCH,
        extract_patches_pallas,
    )

    rng = np.random.default_rng(11)
    n, h, w = 2, 96, 160
    imgs = jnp.asarray(rng.uniform(0, 255, size=(n, h, w)).astype(np.float32))
    k = 23  # deliberately not a multiple of the kernel block size
    xy = rng.uniform(0, [w, h], size=(n, k, 2)).astype(np.float32)

    ref = np.asarray(jax.vmap(orb.extract_patches)(imgs, jnp.asarray(xy)))

    ij = np.stack([xy[..., 1], xy[..., 0]], axis=-1)
    ij = np.round(ij).astype(np.int32) - orb.HALF
    ij = np.clip(ij, 0, [h - PATCH, w - PATCH])
    fidx = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None], (n, k))
    origins = np.concatenate(
        [fidx.reshape(n * k, 1), ij.reshape(n * k, 2)], axis=-1
    )
    out = np.asarray(
        extract_patches_pallas(imgs, jnp.asarray(origins), interpret=True)
    ).reshape(n, k, PATCH, PATCH)
    np.testing.assert_array_equal(out, ref)


def test_describe_batch_pallas_patch_path_equals_xla():
    from droplet_visual_odometry_tpu.frontend import orb

    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.uniform(0, 255, size=(2, 96, 160)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(10, [150, 86], size=(2, 16, 2)).astype(np.float32))
    ref_desc, ref_ang = orb.describe_batch(imgs, xy)
    ops.set_pallas(True)
    try:
        out_desc, out_ang = orb.describe_batch(imgs, xy)
    finally:
        ops.set_pallas(None)
    np.testing.assert_array_equal(np.asarray(out_desc), np.asarray(ref_desc))
    np.testing.assert_allclose(np.asarray(out_ang), np.asarray(ref_ang))


def test_fast_score_pallas_batch_matches_single():
    imgs = jnp.stack([jnp.asarray(_image(96, 128, seed=s)) for s in range(3)])
    from droplet_visual_odometry_tpu.ops.pallas_fast import fast_score_pallas_batch

    batch = np.asarray(fast_score_pallas_batch(imgs, tile_h=32, interpret=True))
    for i in range(3):
        single = np.asarray(fast.fast_score(imgs[i]))
        np.testing.assert_array_equal(batch[i] > 0, single > 0)
        np.testing.assert_allclose(batch[i], single, atol=1e-3, rtol=1e-5)


def test_match_kernel_lowers_for_tpu():
    """Mosaic-verification regression for the round-1 'device wedge'.

    The fused matcher once used broadcasted_iota(jnp.float32, ...), which
    fails Mosaic verification ('tpu.iota' must produce integers); the axon
    tunnel surfaced that as a runtime hang. Cross-platform lowering runs the
    Mosaic verifier on the CPU host — this test fails with VerificationError
    if a non-lowerable op sneaks back into the kernel.
    """
    k = 512
    da = jnp.zeros((k, 8), jnp.uint32)
    va = jnp.ones((k,), bool)
    lowered = (
        jax.jit(lambda a, b, x, y: match_reductions(a, b, x, y))
        .trace(da, da, va, va)
        .lower(lowering_platforms=("tpu",))
    )
    assert "tpu_custom_call" in lowered.as_text()


def test_match_kernel_default_off_everywhere(monkeypatch):
    """Round-4 disposition (MEASURED, tools/aot_match_bench.py + PERF.md):
    the XLA matcher ties the fused kernel at the production K=512, beats it
    at 1024, and the kernel cannot compile at 2048 — so it is OPT-IN only
    (DVO_PALLAS_MATCH=1 / set_pallas(True)), on every backend."""
    from droplet_visual_odometry_tpu import ops

    monkeypatch.setattr(ops, "_MATCH_KERNEL_ENV", None)
    monkeypatch.setattr(ops, "_FORCE", None)

    monkeypatch.setattr(ops.jax, "default_backend", lambda: "tpu")
    assert not ops.pallas_match_enabled()

    # Env opt-in honours the tunnel-wedge guard (advisor r4): enabled only on
    # a directly-attached TPU, refused on a tunneled one.
    monkeypatch.setattr(ops, "_MATCH_KERNEL_ENV", "1")
    monkeypatch.setattr(ops, "_tunneled_tpu", lambda: False)
    assert ops.pallas_match_enabled()
    monkeypatch.setattr(ops, "_tunneled_tpu", lambda: True)
    assert not ops.pallas_match_enabled()
    monkeypatch.setattr(ops, "_MATCH_KERNEL_ENV", "0")
    assert not ops.pallas_match_enabled()
    monkeypatch.setattr(ops, "_MATCH_KERNEL_ENV", None)
    monkeypatch.setattr(ops, "_FORCE", True)
    assert ops.pallas_match_enabled()
