"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The environment pre-imports jax (sitecustomize → axon.register), so setting
JAX_PLATFORMS here via os.environ is too late; we must use jax.config. The
backend itself is initialized lazily, so XLA_FLAGS set here still applies.
Tests exercise the same multi-device sharding code paths that run on a real
TPU slice via an 8-device virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache keeps repeat test runs fast on the slow CPU
# backend. Env vars are too late here (sitecustomize already imported jax,
# same reason jax_platforms uses jax.config above) — set via config.
# The directory is keyed by the host's CPU feature set: XLA:CPU AOT
# artifacts are machine-specific, and loading an entry cached by a host
# with different vector extensions has SEGFAULTED this suite mid-run
# (the loader itself warns "could lead to execution errors such as SIGILL").
from droplet_visual_odometry_tpu.utils.device import machine_cache_dir  # noqa: E402

if not os.environ.get("DVO_DISABLE_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir", machine_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run slow soak-class tests (25k-frame streaming runs)",
    )


import pytest  # noqa: E402


_MODULES_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True, scope="module")
def _unload_jax_executables_periodically():
    """Environment workaround: this image's XLA:CPU JIT segfaults when
    loading a NEW executable into a process that already holds ~200 live
    compiled programs (reproduced 7x: always the latest fresh compile or
    cache-deserialize in full-suite order — the same operation succeeds in a
    fresh or half-suite process, with and without the persistent cache, and
    moves to a different victim when test order changes). Dropping the jit
    caches every couple of test modules keeps the live-executable count far
    below the crash threshold (heaviest module ~40 programs vs ~200) while
    bounding the recompile cost; the persistent disk cache makes the
    cross-module recompiles cheap reloads.
    """
    yield
    _MODULES_SINCE_CLEAR["n"] += 1
    if _MODULES_SINCE_CLEAR["n"] >= 2:
        _MODULES_SINCE_CLEAR["n"] = 0
        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="soak test; opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
