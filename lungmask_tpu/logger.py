"""Logging setup for lungmask_tpu.

Capability parity with the reference logger (/root/reference/lungmask/logger.py:1-13):
a named, non-propagating stdout logger at INFO level with a timestamped format.
"""

import logging
import os
import sys

logger = logging.getLogger("lungmask_tpu")
# LUNGMASK_TPU_LOGLEVEL=DEBUG|INFO|WARNING|ERROR quiets or opens up the
# pipeline logs (e.g. WARNING for cron-driven cohort jobs).
_level = os.environ.get("LUNGMASK_TPU_LOGLEVEL", "INFO").upper()
logger.setLevel(getattr(logging, _level, logging.INFO))
logger.propagate = False
if not logger.handlers:
    _formatter = logging.Formatter(
        fmt="lungmask_tpu %(asctime)s %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(_formatter)
    _handler.setLevel(logger.level)
    logger.addHandler(_handler)
