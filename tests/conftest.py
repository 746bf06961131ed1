"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharded paths
(mesh + shard_map halo exchange, reference src/comm.c equivalents) are
exercised without TPU hardware. Must be set before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


@pytest.fixture(scope="session")
def test_matrices_dir() -> pathlib.Path:
    return DATA / "testMatrices"


@pytest.fixture(scope="session")
def expected_dir() -> pathlib.Path:
    return DATA / "expected"
