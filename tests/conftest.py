"""Test harness: force an 8-virtual-device CPU platform so sharding/collective
paths run without a TPU pod (SURVEY.md §4 test plan)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_data_dir():
    path = "/root/reference/Data"
    if not os.path.isdir(path):
        pytest.skip("reference Data/ not available")
    return path
