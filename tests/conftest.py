"""Test configuration: force an 8-virtual-device CPU mesh.

Replaces the reference's SimulatedDistributedEnv monkeypatch approach
(/root/reference/test_parallelism.py:806-886) with REAL multi-device
execution: XLA's host-platform device count gives 8 actual devices so mesh
collectives (psum/ppermute/all_gather) run for real in tests.

This session's sitecustomize registers a remote TPU backend ("axon") and
forces ``jax_platforms="axon,cpu"``, which would both route test math through
a single remote bf16-matmul TPU chip and pay ~40s of relay connection.
Backends initialize lazily, so overriding the platform selection here — after
the sitecustomize import of jax but before any computation — keeps tests on
pure fp32 CPU with 8 devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
