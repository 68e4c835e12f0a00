"""Logging setup: stream + file handlers + JSONL metric writer.

reference: utils/logger.py:7-28 (setup_logger). The metric writer replaces
the reference's TensorBoard SummaryWriter with hardcoded path
(engine/processor.py:42) by a structured JSONL stream under OUTPUT_DIR
(SURVEY.md §5.5) — TensorBoard-importable and grep-able.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def setup_logger(name: str, save_dir: Optional[str], filename: str,
                 distributed_rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if distributed_rank > 0:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    if not any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setLevel(logging.DEBUG)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if save_dir:
        # loggers are process-global singletons: a second run with a
        # different OUTPUT_DIR must swap the file handler, not silently
        # keep logging into the first run's file
        path = os.path.abspath(os.path.join(save_dir, filename))
        stale = [h for h in logger.handlers
                 if isinstance(h, logging.FileHandler)
                 and getattr(h, "baseFilename", None) != path]
        for h in stale:
            logger.removeHandler(h)
            h.close()
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == path
                   for h in logger.handlers):
            os.makedirs(save_dir, exist_ok=True)
            fh = logging.FileHandler(path)
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class MetricWriter:
    """Append-only JSONL metrics (one record per call), with an optional
    TensorBoard mirror (reference SummaryWriter, engine/processor.py:42).

    TB records use ``step`` (or ``iter``, or ``epoch``) as the global step
    and emit every scalar field — unlike the reference, which logged
    per-iter loss with ``global_step=epoch`` (processor.py:93 quirk, not
    replicated)."""

    def __init__(self, save_dir: Optional[str], filename: str = "metrics.jsonl",
                 tensorboard: bool = False):
        self.path = None
        self.tb = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.path = os.path.join(save_dir, filename)
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self.tb = SummaryWriter(os.path.join(save_dir, "tb"))
                except Exception:  # noqa: BLE001 — TB optional, JSONL stays
                    logging.getLogger(__name__).warning(
                        "tensorboard unavailable; metrics stay JSONL-only")

    def write(self, record: Dict[str, Any]):
        if self.path is None:
            return
        record = dict(record, ts=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb is not None:
            step = record.get("step", record.get("iter", record.get("epoch", 0)))
            for k, v in record.items():
                if k in ("ts", "step", "iter") or not isinstance(v, (int, float)):
                    continue
                self.tb.add_scalar(k, v, int(step))
            self.tb.flush()

    def close(self):
        if self.tb is not None:
            self.tb.close()
