"""Tests for the native (C++) sequence store and its numpy fallback."""

import numpy as np
import pytest

from droplet_visual_odometry_tpu.data import native_store as ns
from droplet_visual_odometry_tpu.data import sequence as seq_mod


@pytest.fixture()
def store(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (13, 24, 32), dtype=np.uint8)
    stamps = (np.arange(13) * 0.05 + 100.0).astype(np.float64)
    path = str(tmp_path / "seq.vostore")
    ns.write_store(path, frames, stamps)
    return path, frames, stamps


@pytest.fixture(params=["native", "fallback"])
def backend(request, monkeypatch):
    if request.param == "native":
        if not ns.native_available():
            pytest.skip("native library unavailable (no g++/make)")
    else:
        monkeypatch.setattr(ns, "_try_load", lambda: None)
    return request.param


def test_roundtrip_and_chunks(store, backend, tmp_path):
    path, frames, stamps = store
    # Re-write through the selected backend too (fallback writes same layout).
    path2 = str(tmp_path / "seq2.vostore")
    ns.write_store(path2, frames, stamps)
    with ns.StoreReader(path2) as r:
        assert (r.n, r.h, r.w) == frames.shape
        np.testing.assert_array_equal(r.timestamps(), stamps)
        np.testing.assert_array_equal(r.read(0, 13), frames)
        np.testing.assert_array_equal(r.read(5, 4), frames[5:9])
        got = []
        for start, chunk in r.iter_chunks(5):
            got.append((start, chunk.copy()))
        starts = [s for s, _ in got]
        assert starts == [0, 5, 10]
        np.testing.assert_array_equal(np.concatenate([c for _, c in got]), frames)
        with pytest.raises(IndexError):
            r.read(10, 5)


def test_cross_backend_compatibility(store):
    """A file written by either backend reads identically in the other:
    the layout is the contract, not the implementation."""
    path, frames, stamps = store
    with ns.StoreReader(path) as r:
        np.testing.assert_array_equal(r.read(0, r.n), frames)


def test_pair_stamps_matches_python_pairing(backend):
    rng = np.random.default_rng(1)
    a = np.sort(rng.choice(np.arange(0, 200) * 0.1, size=60, replace=False))
    b = np.sort(rng.choice(np.arange(0, 200) * 0.1, size=80, replace=False))
    ia, ib = ns.pair_stamps(a, b)
    # Same stamp set as the python exact-intersection rule
    # (data/sequence.py:pair_timestamps, get_valid_message_stream.py:39-53).
    common = seq_mod.pair_timestamps(a, b)
    np.testing.assert_allclose(a[ia], common)
    np.testing.assert_allclose(b[ib], common)
    # Indices actually point at equal stamps.
    np.testing.assert_array_equal(a[ia], b[ib])


def test_rgb_to_gray_both_orders(backend):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (9, 11, 3), dtype=np.uint8)
    x = img.astype(np.uint32)
    expect_rgb = ((9798 * x[..., 0] + 19235 * x[..., 1] + 3735 * x[..., 2] + (1 << 14)) >> 15).astype(np.uint8)
    expect_bgr = ((9798 * x[..., 2] + 19235 * x[..., 1] + 3735 * x[..., 0] + (1 << 14)) >> 15).astype(np.uint8)
    np.testing.assert_array_equal(ns.rgb_to_gray(img, "rgb"), expect_rgb)
    np.testing.assert_array_equal(ns.rgb_to_gray(img, "bgr"), expect_bgr)


def test_prefetch_large_sequence(store, tmp_path):
    """Prefetch ring correctness under many chunks (wraparound)."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (97, 16, 16), dtype=np.uint8)
    stamps = np.arange(97, dtype=np.float64)
    path = str(tmp_path / "big.vostore")
    ns.write_store(path, frames, stamps)
    with ns.StoreReader(path) as r:
        got = np.concatenate([c for _, c in r.iter_chunks(7, nslots=3)])
    np.testing.assert_array_equal(got, frames)


def test_iter_chunks_zero_copy_matches_copy(tmp_path):
    """copy=False yields the same bytes as the copying path on both the
    native prefetch ring (acquire/release) and the mmap fallback."""
    import numpy as np

    from droplet_visual_odometry_tpu.data import native_store

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (11, 6, 8), dtype=np.uint8)
    stamps = np.arange(11, dtype=np.float64)
    path = str(tmp_path / "zc.vostore")
    native_store.write_store(path, frames, stamps)

    with native_store.StoreReader(path) as r:
        got = [(s, f.copy()) for s, f in r.iter_chunks(4, copy=False)]
    with native_store.StoreReader(path) as r:
        ref = list(r.iter_chunks(4))
    assert [s for s, _ in got] == [s for s, _ in ref]
    for (_, a), (_, b) in zip(got, ref):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.concatenate([f for _, f in got]), frames)
