"""stdlib logging setup (reference utils/logger.py:10-52)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def setup_logger(
    name: str = "v2v_tpu",
    log_file: Optional[str] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """Console (+ optional file) logger with a consistent format."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
