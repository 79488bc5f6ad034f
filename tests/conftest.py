"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's CPU-backend-as-oracle strategy (SURVEY.md §4): tests
run on CPU with 8 virtual devices so multi-chip sharding paths are exercised
without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
