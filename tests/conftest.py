"""Test configuration.

Tests run on whatever backend the interpreter booted with:
- default env (axon): the real TPU chip — the reference's "GPU suite" analog.
- `PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
  gives an 8-virtual-device CPU mesh — the cross-backend oracle + sharding
  tests (SURVEY.md §4 strategy). NOTE: the axon sitecustomize imports jax at
  interpreter startup, so the platform can only be chosen via env vars BEFORE
  python starts; conftest cannot override it.

The TPU tunnel is single-tenant: never run two jax test processes
concurrently.
"""
import os

import pytest

# Persistent compilation cache: the host has a single CPU core, so local XLA
# compiles are expensive — cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _enable_cache():
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_cache()


def pytest_configure(config):
    config.addinivalue_line("markers", "multidevice: requires >= 2 jax devices")


def pytest_collection_modifyitems(config, items):
    import jax

    n = len(jax.devices())
    skip = pytest.mark.skip(reason="requires >=2 devices (run with CPU 8-dev mesh)")
    for item in items:
        if "multidevice" in item.keywords and n < 2:
            item.add_marker(skip)
