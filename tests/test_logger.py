"""Logger configuration contract (reference parity: lungmask/logger.py:1-13).

The package logger must (a) default to INFO on stdout with the timestamped
format, (b) honor LUNGMASK_TPU_LOGLEVEL, and (c) NOT clobber a level a caller
configured before the first package import — bench.py relies on (c) to keep
its stdout a single JSON line (a leaked INFO download line once preceded the
JSON and broke the driver contract).
"""

import logging
import os
import subprocess
import sys

import pytest

_LOGGER_PY = os.path.join(
    os.path.dirname(__file__), "..", "lungmask_tpu", "logger.py"
)

# logger.py imports only stdlib, so the subprocess loads it by path (module
# identity is irrelevant here: the contract lives on the shared
# logging.getLogger('lungmask_tpu') object) — this keeps each case ~100 ms
# instead of paying the full package/jax import.
_LOAD = (
    "import importlib.util as iu;"
    f"spec = iu.spec_from_file_location('lm_logger', {_LOGGER_PY!r});"
    "L = iu.module_from_spec(spec); spec.loader.exec_module(L);"
)


def _run(code: str, env_extra=None):
    env = dict(os.environ)
    env.pop("LUNGMASK_TPU_LOGLEVEL", None)
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )


@pytest.mark.parametrize(
    "code,env,expect_out,forbid_out",
    [
        (  # default: INFO visible on stdout, reference format prefix
            "L.logger.info('probe-info-line')",
            None,
            "lungmask_tpu ",
            None,
        ),
        (  # env switch quiets INFO
            "L.logger.info('probe-info-line');L.logger.error('probe-err')",
            {"LUNGMASK_TPU_LOGLEVEL": "ERROR"},
            "probe-err",
            "probe-info-line",
        ),
        (  # pre-configured setLevel survives the module import (bench.py contract)
            "PRE;"
            "assert L.logger.level == logging.WARNING;"
            "L.logger.info('probe-info-line');L.logger.warning('probe-warn')",
            None,
            "probe-warn",
            "probe-info-line",
        ),
    ],
)
def test_logger_level_contract(code, env, expect_out, forbid_out):
    if code.startswith("PRE;"):
        code = (
            "import logging;"
            "logging.getLogger('lungmask_tpu').setLevel(logging.WARNING);"
            + _LOAD
            + code[len("PRE;"):]
        )
    else:
        code = "import logging;" + _LOAD + code
    r = _run(code, env)
    assert r.returncode == 0, r.stderr
    assert expect_out in r.stdout
    if forbid_out:
        assert forbid_out not in r.stdout


def test_logger_shape():
    """Named, non-propagating, single stdout handler — the reference's shape.

    Runs in a subprocess: under pytest --capture=sys (or any earlier
    sys.stdout swap after the package was first imported) the in-process
    handler holds the ORIGINAL stdout object, so an in-process
    ``h.stream is sys.stdout`` check fails spuriously.
    """
    r = _run(
        _LOAD
        + "import sys, logging;"
        "assert L.logger.name == 'lungmask_tpu';"
        "assert L.logger.propagate is False;"
        "streams = [h.stream for h in L.logger.handlers"
        " if isinstance(h, logging.StreamHandler)];"
        "assert sys.stdout in streams"
    )
    assert r.returncode == 0, r.stderr
