"""Structured metric logging: JSONL stream per run.

Upgrades the reference's print-to-stdout + pickled metric histories
(`rslts_saving/`, SURVEY.md §5) to an append-only JSONL file that tools can
tail; each record carries the step and wall-clock timestamp. No TensorBoard
dependency — the format is trivially importable into anything.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsWriter:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)

    def write(self, record: dict) -> None:
        rec = dict(record)
        rec.setdefault("time", time.time())
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
