"""Severity-mapped singleton logger.

Counterpart of the reference's ``tensorrt_llm/logger.py:22-129`` (a python
logger bridged to TensorRT's ILogger).  On TPU there is no engine logger to
bridge, so this is a thin, env-overridable (``TLLM_LOG_LEVEL``-style) wrapper
around :mod:`logging` with the same five levels and ``set_level`` API.
"""
from __future__ import annotations

import logging
import os

_SEVERITY = {
    "internal_error": logging.CRITICAL,
    "error": logging.ERROR,
    "warning": logging.WARNING,
    "info": logging.INFO,
    "verbose": logging.DEBUG,
    "debug": logging.DEBUG,
}


class Logger:
    ENV_VARIABLE = "EWT_LOG_LEVEL"
    DEFAULT_LEVEL = "warning"

    def __init__(self):
        self._logger = logging.getLogger("eddie_wang_hackathon2023_tpu")
        if not self._logger.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(
                logging.Formatter("[%(asctime)s] [EWT] [%(levelname)s] %(message)s"))
            self._logger.addHandler(handler)
        self._logger.propagate = False
        self.set_level(os.environ.get(self.ENV_VARIABLE, self.DEFAULT_LEVEL))

    @property
    def level(self) -> str:
        return self._level

    def set_level(self, level: str) -> None:
        if level not in _SEVERITY:
            raise ValueError(f"unknown log level {level!r}; one of {list(_SEVERITY)}")
        self._level = level
        self._logger.setLevel(_SEVERITY[level])

    def internal_error(self, msg, *args):
        self._logger.critical(msg, *args)

    def error(self, msg, *args):
        self._logger.error(msg, *args)

    def warning(self, msg, *args):
        self._logger.warning(msg, *args)

    def info(self, msg, *args):
        self._logger.info(msg, *args)

    def debug(self, msg, *args):
        self._logger.debug(msg, *args)


logger = Logger()


def set_level(level: str) -> None:
    logger.set_level(level)
