"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Mirrors the strategy SURVEY.md §4 prescribes for the TPU build: tests run on
CPU-backed JAX (`--xla_force_host_platform_device_count=8`) so the whole
suite — including SPMD/sharding tests — runs without TPU hardware; Pallas
kernels run in interpreter mode (the `native-vs-fallback differential`
pattern, tests/test_embeddings.py:199-284 in the reference). Real-hardware
benchmarking lives in bench.py, not here.

Must run before jax initializes a backend, hence env mutation at import time.
"""

import os

# Force the CPU backend with 8 virtual devices. The environment's
# sitecustomize may have already registered (and selected) the axon TPU
# backend, so overriding the env var alone is not enough — jax.config wins,
# and XLA_FLAGS still applies because no backend is initialized yet.
existing = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (
        existing + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
