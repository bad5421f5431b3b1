"""Logging setup: rotating file sink + console, stdlib-logging capture.

Functional equivalent of the reference's loguru stack (multiprocessing-safe
rotating file sink + stdlib intercept + stream redirects;
/root/reference/model/graph_model.py:281-317,
/root/reference/utils/custom_logger.py:9-58,
/root/reference/utils/run_utils.py:49-104) built on the standard library —
no extra dependency, same observable behavior.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Optional

_FMT = "%(asctime)s | %(levelname)-8s | %(name)s:%(funcName)s:%(lineno)d - %(message)s"


def setup_logging(log_file: Optional[str] = None,
                  level: int = logging.INFO,
                  rotate_mb: int = 100,
                  backups: int = 5,
                  capture_root: bool = True) -> logging.Logger:
    """Configure the 'vae_teb_tpu' logger (console + optional rotating file).

    capture_root also raises the root logger so third-party stdlib logging
    flows through the same handlers (the reference's InterceptHandler role).
    """
    logger = logging.getLogger("vae_teb_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    formatter = logging.Formatter(_FMT)

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(formatter)
    logger.addHandler(console)

    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fileh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=rotate_mb * 1024 * 1024, backupCount=backups)
        fileh.setFormatter(formatter)
        logger.addHandler(fileh)

    if capture_root:
        root = logging.getLogger()
        root.setLevel(level)
        for h in list(root.handlers):
            root.removeHandler(h)
        for h in logger.handlers:
            root.addHandler(h)
        logger.propagate = False
    return logger


def get_logger(name: str = "vae_teb_tpu") -> logging.Logger:
    return logging.getLogger(name)


class StreamToLogger:
    """Redirect a stream (stdout/stderr) into a logger
    (reference run_utils.py:49-104)."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buffer = ""

    def write(self, message: str) -> None:
        self._buffer += message
        while "\n" in self._buffer:
            line, self._buffer = self._buffer.split("\n", 1)
            if line.strip():
                self.logger.log(self.level, line.rstrip())

    def flush(self) -> None:
        if self._buffer.strip():
            self.logger.log(self.level, self._buffer.rstrip())
        self._buffer = ""
