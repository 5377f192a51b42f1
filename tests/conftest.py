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
jax.config.update("jax_compilation_cache_dir", "/tmp/dvo_jax_cache")
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


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest

    skip = pytest.mark.skip(reason="soak test; opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
