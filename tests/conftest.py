"""Test environment: hermetic CPU backend with a virtual 8-device mesh.

This is the TPU analogue of a fake backend — multi-chip sharding code paths
compile and execute on 8 virtual CPU devices, so tests never need real TPU
hardware (see SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def ref_data_dir():
    return "/root/reference/data"
