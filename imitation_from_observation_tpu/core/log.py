"""Experiment logging: prefix-stacked text log + tabular CSV.

Capability match for the reference's global logger
(``rllab/misc/logger.py:113-232``): ``log`` writes timestamped text to console
and ``debug.log``; ``record_tabular``/``dump_tabular`` accumulate key/value
rows flushed to ``progress.csv`` (schema grows monotonically); and
``record_tabular_misc_stat`` expands a vector into Average/Std/Min/Max
columns. Unlike the reference this is an instantiable object, not module
globals, so parallel experiments don't collide.
"""

from __future__ import annotations

import csv
import datetime
import os
import sys
import time
from contextlib import contextmanager
from typing import Any, Iterable

import numpy as np


class Logger:
    def __init__(self, log_dir: str | None = None, stdout: bool = True):
        self.log_dir = log_dir
        self._stdout = stdout
        self._prefixes: list[str] = []
        self._tabular: dict[str, Any] = {}
        self._csv_path = None
        self._csv_keys: list[str] = []
        self._text_file = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._csv_path = os.path.join(log_dir, "progress.csv")
            self._text_file = open(os.path.join(log_dir, "debug.log"), "a")

    # -- text -------------------------------------------------------------
    def log(self, msg: str) -> None:
        stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f %Z")
        line = f"{stamp} | {''.join(self._prefixes)}{msg}"
        if self._stdout:
            print(line, file=sys.stderr)
        if self._text_file is not None:
            self._text_file.write(line + "\n")
            self._text_file.flush()

    @contextmanager
    def prefix(self, p: str):
        self._prefixes.append(p)
        try:
            yield
        finally:
            self._prefixes.pop()

    # -- tabular ----------------------------------------------------------
    def record_tabular(self, key: str, value: Any) -> None:
        self._tabular[key] = value

    def record_tabular_misc_stat(self, key: str, values: Iterable[float]) -> None:
        arr = np.asarray(list(values), dtype=np.float64)
        if arr.size:
            stats = dict(
                Average=float(arr.mean()),
                Std=float(arr.std()),
                Median=float(np.median(arr)),
                Min=float(arr.min()),
                Max=float(arr.max()),
            )
        else:
            stats = dict(Average=np.nan, Std=np.nan, Median=np.nan, Min=np.nan, Max=np.nan)
        for suffix, v in stats.items():
            self._tabular[key + suffix] = v

    def dump_tabular(self) -> dict[str, Any]:
        row = dict(self._tabular)
        self._tabular.clear()
        if not row:
            return row
        width = max(len(k) for k in row)
        for k in sorted(row):
            self.log(f"{k.ljust(width)}  {row[k]}")
        if self._csv_path is not None:
            new_keys = [k for k in row if k not in self._csv_keys]
            if new_keys:
                # schema grew: rewrite header preserving prior rows
                old_rows = []
                if self._csv_keys and os.path.exists(self._csv_path):
                    with open(self._csv_path) as f:
                        old_rows = list(csv.DictReader(f))
                self._csv_keys.extend(sorted(new_keys))
                with open(self._csv_path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=self._csv_keys, restval="")
                    w.writeheader()
                    for r in old_rows:
                        w.writerow(r)
            with open(self._csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_keys, restval="")
                w.writerow(row)
        return row

    # -- phase timing (replaces the TF sandbox's ad-hoc ItrTime metrics) --
    @contextmanager
    def timed(self, key: str):
        t0 = time.perf_counter()
        yield
        self.record_tabular(key + "Time", time.perf_counter() - t0)

    def close(self) -> None:
        if self._text_file is not None:
            self._text_file.close()
            self._text_file = None


_default_logger: Logger | None = None


def get_logger(log_dir: str | None = None) -> Logger:
    """Return the process-default logger, creating it on first use."""
    global _default_logger
    if _default_logger is None or (
        log_dir is not None and _default_logger.log_dir != log_dir
    ):
        _default_logger = Logger(log_dir)
    return _default_logger
