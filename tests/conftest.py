"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is
imported anywhere, so the full multi-chip sharding path is exercised in CI
without TPU hardware (mirrors the reference's strategy of running everything
in-process with WebApplicationFactory, SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter start, which
# latches JAX_PLATFORMS before this file runs — override via jax.config
# (the backend itself is still uninitialized at this point, so XLA_FLAGS
# above is honored when the CPU client spins up).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def store():
    from omni_recall_tpu.index.store import InMemoryIngestionStore

    return InMemoryIngestionStore()
