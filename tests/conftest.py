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

# Persistent compile cache keeps repeat test runs fast on the slow CPU backend.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dvo_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
