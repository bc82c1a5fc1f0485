"""Logging utilities (reference ``Reflected-Diffusion/utils.py:17-45``).

The ``%(asctime)s - %(message)s`` format and the
``step: N, training_loss: X`` message layout are load-bearing: the
Telemetry tooling regex-parses them (``Telemetry/plot_losses.py:24-36``).
"""
from __future__ import annotations

import logging
import os


def makedirs(dirname: str) -> None:
    os.makedirs(dirname, exist_ok=True)


def get_logger(logpath: str, displaying: bool = True, saving: bool = True,
               debug: bool = False) -> logging.Logger:
    logger = logging.getLogger()
    level = logging.DEBUG if debug else logging.INFO
    if logger.hasHandlers():
        logger.handlers.clear()
    logger.setLevel(level)
    formatter = logging.Formatter("%(asctime)s - %(message)s")
    if saving:
        fh = logging.FileHandler(logpath, mode="a")
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    if displaying:
        ch = logging.StreamHandler()
        ch.setLevel(level)
        ch.setFormatter(formatter)
        logger.addHandler(ch)
    return logger
