"""Test configuration: run the JAX test suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY §4: the reference has no
distributed tests; we add them on a host-device mesh).
"""

import os

# Must be set before jax is imported anywhere in the test process. Forced (not
# setdefault): the container env pins JAX_PLATFORMS=axon globally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TESTDATA = "/root/reference/tests/testdata"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
