"""Test environment: hermetic CPU backend with a virtual 8-device mesh.

This is the TPU analogue of a fake backend — multi-chip sharding code paths
compile and execute on 8 virtual CPU devices, so tests never need real TPU
hardware (see SURVEY.md §4).
"""

import os

# Force CPU even when the environment pins another platform (e.g. a
# tunneled TPU via JAX_PLATFORMS=axon) — tests must be hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the model-core jit signatures are expensive
# to compile on CPU; cache them across test sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The environment's TPU plugin prepends itself to jax_platforms regardless
# of JAX_PLATFORMS; force the resolved config to CPU-only.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def ref_data_dir():
    return "/root/reference/data"
