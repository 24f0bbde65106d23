"""Logging / metrics utilities.

Reference semantics: `lib/utils.py:13-117` in AWehenkel/UMNN — console+file
logger that records the driver's own source for provenance, plus scalar
metric streams (the reference used tensorboardX; here metrics go to JSONL,
which is grep-able and needs no extra deps; point tensorboard at it later
if desired).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Optional


def get_logger(
    name: str = "umnn_tpu",
    logpath: Optional[str | Path] = None,
    displaying: bool = True,
    saving: bool = True,
    source_file: Optional[str | Path] = None,
) -> logging.Logger:
    """Console+file logger; optionally archives the calling script's source
    into the log for provenance (`lib/utils.py:28-35` behavior)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    if saving and logpath is not None:
        Path(logpath).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(logpath, mode="a")
        fh.setLevel(logging.INFO)
        logger.addHandler(fh)
        if source_file is not None and Path(source_file).exists():
            logger.info("===== source of %s =====", source_file)
            logger.info(Path(source_file).read_text())
            logger.info("===== end source =====")
    if displaying:
        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(logging.INFO)
        logger.addHandler(sh)
    return logger


class MetricsWriter:
    """Append-only JSONL scalar stream: one {"step", "tag", "value", "ts"}
    record per scalar (the tensorboardX-equivalent sink)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(
            json.dumps(
                {"step": step, "tag": tag, "value": float(value), "ts": time.time()}
            )
            + "\n"
        )
        self._f.flush()

    def close(self):
        self._f.close()


class AverageMeter:
    """Running mean of a stream of scalars."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
