"""Logging setup for lungmask_tpu.

Capability parity with the reference logger (/root/reference/lungmask/logger.py:1-13):
a named, non-propagating stdout logger at INFO level with a timestamped format.
"""

import logging
import os
import sys

logger = logging.getLogger("lungmask_tpu")
# LUNGMASK_TPU_LOGLEVEL=DEBUG|INFO|WARNING|ERROR quiets or opens up the
# pipeline logs (e.g. WARNING for cron-driven cohort jobs). An explicit env
# value always wins; otherwise a level a caller configured BEFORE this import
# is respected (e.g. bench.py quieting stdout before its first package
# import), and the default is the reference's INFO.
_env_level = os.environ.get("LUNGMASK_TPU_LOGLEVEL")
if _env_level is not None:
    # getLevelName returns an int only for real level names — a stray value
    # (e.g. BASIC_FORMAT) must fall back to INFO, not crash the import.
    _lvl = logging.getLevelName(_env_level.upper())
    logger.setLevel(_lvl if isinstance(_lvl, int) else logging.INFO)
elif logger.level == logging.NOTSET:
    logger.setLevel(logging.INFO)
logger.propagate = False
if not logger.handlers:
    _formatter = logging.Formatter(
        fmt="lungmask_tpu %(asctime)s %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(_formatter)
    # No handler-level filter: the logger's level (which callers may change
    # at any time) is the single gate.
    logger.addHandler(_handler)
