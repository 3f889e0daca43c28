"""Test configuration.

Device-kernel tests run on a virtual 8-device CPU mesh so sharding paths
are exercised without TPU hardware.  The container's axon sitecustomize
force-registers the TPU backend at interpreter start (and its remote
compiles take ~60s each), so we must both set XLA_FLAGS before jax import
AND override jax_platforms after import.  Set SICKLE_TPU_TEST_REAL_DEVICE=1
to run on whatever JAX would pick by default instead.
"""

import os

if not os.environ.get("SICKLE_TPU_TEST_REAL_DEVICE"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_TEST_DIR = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def reference_fixtures():
    """Path to the reference FASTQ fixtures; skip if unavailable."""
    if not REFERENCE_TEST_DIR.is_dir():
        pytest.skip("reference fixtures not available")
    return REFERENCE_TEST_DIR
