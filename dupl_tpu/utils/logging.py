"""Logging / observability helpers (reference: utils/pyutils.py)."""

from __future__ import annotations

import datetime
import logging
import sys
from typing import Dict, Optional


def setup_logger(filename: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    """File + stream logger (reference: utils/pyutils.py:30-43)."""
    logger = logging.getLogger("dupl_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename:
        fh = logging.FileHandler(filename)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Windowed scalar means, popped at log intervals
    (reference: utils/pyutils.py:59-87).

    Values are held as-is (device scalars included) and only converted to
    Python floats at ``get``/``pop`` — a per-step ``float()`` would force a
    host round-trip per metric per iteration, serialising dispatch against
    the device (~30 ms relay latency per sync) and blocking the step
    pipeline; deferring the sync to the log boundary lets XLA queue steps
    back-to-back."""

    def __init__(self):
        self._vals: Dict[str, list] = {}

    def add(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self._vals.setdefault(k, []).append(v)

    def get(self, key: str) -> float:
        vals = self._vals.get(key)
        if not vals:
            return 0.0
        return sum(float(v) for v in vals) / len(vals)

    def pop(self, key: str) -> float:
        val = self.get(key)
        self._vals.pop(key, None)
        return val


def cal_eta(start: datetime.datetime, cur_iter: int, total_iter: int):
    """Elapsed / remaining wall time strings (reference: utils/pyutils.py:46-56)."""
    now = datetime.datetime.now().replace(microsecond=0)
    elapsed = now - start.replace(microsecond=0)
    if cur_iter > 0:
        eta = datetime.timedelta(
            seconds=int(elapsed.total_seconds() * (total_iter - cur_iter) / cur_iter)
        )
    else:
        eta = datetime.timedelta(0)
    return str(elapsed), str(eta)
