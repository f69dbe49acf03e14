"""Test harness: force an 8-virtual-device CPU platform so sharding/collective
paths run without a TPU pod (SURVEY.md §4 test plan).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so the env var alone is not enough — we override via jax.config
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_data_dir():
    path = "/root/reference/Data"
    if not os.path.isdir(path):
        pytest.skip("reference Data/ not available")
    return path
