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

# The container's sitecustomize can initialize the accelerator backend before
# this file runs, locking the platform and device count. Recover to an
# 8-device CPU platform in that case (parallel.mesh.ensure_host_devices).
import jax  # noqa: E402

if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    from lungmask_tpu.parallel.mesh import ensure_host_devices  # noqa: E402

    n = ensure_host_devices(8)
    assert jax.default_backend() == "cpu" and n >= 8, (
        jax.default_backend(),
        n,
    )

REFERENCE_TESTDATA = "/root/reference/tests/testdata"


def pytest_report_header(config):
    """Surface golden-gate status loudly: the voxel-identical north star is
    only proven when the real checkpoints are present in the cache."""
    from lungmask_tpu.models import registry

    missing = []
    for name in ("R231", "LTRCLobes"):
        url, _ = registry.MODEL_URLS[name]
        pth = os.path.join(registry.cache_dir(), os.path.basename(url))
        if not (os.path.exists(registry._npz_cache_path(name)) or os.path.exists(pth)):
            missing.append(os.path.basename(url))
    if missing:
        return (
            "WARNING: real pretrained weights NOT cached -> golden-count "
            f"parity gates in tests/test_golden.py will SKIP. Drop "
            f"{', '.join(missing)} into {registry.cache_dir()} to activate them."
        )
    return "golden-count parity gates ACTIVE (real weights cached)"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
