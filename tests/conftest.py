"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharded paths
(mesh + shard_map halo exchange, reference src/comm.c equivalents) are
exercised without TPU hardware. Must be set before jax import.
"""

import os

# Force the CPU backend with 8 virtual devices. The environment's
# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# (the real TPU) already set, so jax's config has captured that value —
# env mutation here is too late; jax.config.update is required. The
# XLA_FLAGS env is still read lazily at backend init, so it can be set here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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


_EXIT_STATUS = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS["code"] = int(exitstatus)


def pytest_unconfigure(config):
    # XLA's CPU client teardown under --xla_force_host_platform_device_count
    # intermittently deadlocks or segfaults AFTER all tests completed and
    # all results were reported (observed with large interpret-mode pallas
    # programs; Python-side thread list is empty at that point). Skip
    # interpreter teardown entirely, preserving pytest's exit status —
    # the same workaround bench.py uses for the TPU relay's teardown spin.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_EXIT_STATUS["code"])
