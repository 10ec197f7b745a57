"""Logging + TensorBoard observability.

Reference: utils/util.py:80-94 (file+screen loggers), train.py:98-111,216-224
(train/valid TB writers). TensorBoard is provided through torch's bundled
SummaryWriter when available; JSONL metrics are always written so headless
TPU runs keep a machine-readable trace.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


def setup_logger(name: str, log_dir: Optional[str] = None, *, level=logging.INFO,
                 screen: bool = True, tofile: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
                            datefmt="%y-%m-%d %H:%M:%S")
    if tofile and log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, f"{name}_{int(time.time())}.log")
        fh = logging.FileHandler(path, mode="w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


class MetricsWriter:
    """JSONL metrics + optional TensorBoard scalars."""

    def __init__(self, log_dir: str, *, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
            except Exception:  # noqa: BLE001 - TB optional
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step), "t": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
