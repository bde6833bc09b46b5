"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container registers an 'axon' TPU PJRT plugin via sitecustomize and sets
JAX_PLATFORMS=axon; plain env vars don't reliably win, so we force the
platform through jax.config before any backend is initialized.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def ref_data():
    if not REFERENCE_TEST_DATA.is_dir():
        pytest.skip("reference test_data not available")
    return REFERENCE_TEST_DATA
