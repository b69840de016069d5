"""Verbosity-leveled printing and per-run logging (reference
``hydragnn/utils/print/print_utils.py``): level 0-4 switcher, master vs
all-process printing, file+console logger per run directory."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_logger: Optional[logging.Logger] = None


def _is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def print_master(*args, verbosity_level: int = 0, verbosity: int = 2):
    if _is_master() and verbosity >= verbosity_level:
        print(*args)


def print_all(*args, verbosity_level: int = 0, verbosity: int = 2):
    if verbosity >= verbosity_level:
        print(*args)


def print_distributed(verbosity: int, *args):
    """Reference ``print_distributed``: level>=2 prints on master."""
    if verbosity >= 2 and _is_master():
        print(*args)


def setup_log(log_name: str, log_root: str = "logs") -> str:
    """Per-run file+console logger (``print_utils.py:62-90``)."""
    global _logger
    path = os.path.join(log_root, log_name)
    os.makedirs(path, exist_ok=True)
    logger = logging.getLogger("hydragnn_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(path, "run.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    logger.addHandler(sh)
    _logger = logger
    return path


def log(*args):
    msg = " ".join(str(a) for a in args)
    if _logger is not None:
        _logger.info(msg)
    else:
        print(msg)


def log0(*args):
    if _is_master():
        log(*args)
