"""Test harness: force JAX onto 8 virtual CPU devices.

The axon sitecustomize registers a TPU backend in every interpreter; tests
must run on CPU (BASELINE.json:7 requires Tiny DSSM to be CPU-runnable) with
8 faked devices so the full pjit/mesh path — DP sharding, all-gather negative
pool, sharded embedding — is exercised without TPU hardware (SURVEY.md §5.3).

XLA_FLAGS must be set before the CPU backend initializes; jax_platforms can
be flipped after import as long as no backend has been touched yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
