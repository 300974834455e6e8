"""Per-process logging setup.

Equivalent of the reference's per-worker logging re-init
(reference: utils/logging.py:34-65 and the inline basicConfig blocks in
every engine, e.g. tools/inferences/inference_i2vgen_entrance.py:109-118):
file + stdout handlers, rank-tagged file names, rank-0-only option.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Optional

_FORMAT = "[%(asctime)s] %(levelname)s: %(message)s"


def setup_logging(log_dir: Optional[str] = None, rank: int = 0,
                  filename: str = "log.txt", rank0_only: bool = False,
                  level: int = logging.INFO) -> logging.Logger:
    """(Re)configure the root logger with stdout + optional file handlers."""
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    root.setLevel(level)

    if not (rank0_only and rank != 0):
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(sh)

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stem, ext = os.path.splitext(filename)
        path = os.path.join(log_dir, f"{stem}_rank{rank:02d}{ext}")
        fh = logging.FileHandler(path)
        fh.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(fh)
    return root


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def log_json_stats(stats: dict, logger: Optional[logging.Logger] = None):
    """One-line json stats record (reference utils/logging.py:78-90)."""
    (logger or logging.getLogger()).info("json_stats: %s", json.dumps(stats, default=str))
