"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is
imported anywhere, so the full multi-chip sharding path is exercised in CI
without TPU hardware (mirrors the reference's strategy of running everything
in-process with WebApplicationFactory, SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture()
def store():
    from omni_recall_tpu.index.store import InMemoryIngestionStore

    return InMemoryIngestionStore()
