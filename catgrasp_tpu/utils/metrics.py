"""Structured metrics logging (JSONL) — replaces the reference's raw
``print`` counters (rejection tallies at ``my_cpp/common.cpp:316-319``,
label-gen stats at ``tool.py:315-376``, end-of-run tallies at
``run_grasp_simulation.py:719``) with machine-readable event streams.
"""
from __future__ import annotations

import json
import os
import time
from collections import Counter
from typing import Any


class MetricsLogger:
    """Append-only JSONL event log + in-memory counters.

    >>> log = MetricsLogger("/tmp/run/metrics.jsonl", run="eval0")
    >>> log.event("attempt", round=0, picked=True)
    >>> log.incr("num_stable_grasp")
    >>> log.close()   # writes a final "summary" event with all counters
    """

    def __init__(self, path: str | None = None, **run_fields):
        self.path = path
        self.run_fields = run_fields
        self.counters: Counter = Counter()
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def event(self, kind: str, **fields: Any):
        rec = {"t": round(time.time(), 3), "kind": kind, **self.run_fields,
               **{k: _jsonable(v) for k, v in fields.items()}}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
        return rec

    def incr(self, name: str, by: int = 1):
        self.counters[name] += by

    def gauge(self, name: str, value: float):
        self.event("gauge", name=name, value=float(value))

    def summary(self) -> dict:
        return dict(self.counters)

    def close(self):
        if self._fh:
            self.event("summary", **self.summary())
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        import numpy as np
        if hasattr(v, "item") and getattr(v, "size", 2) == 1:
            return v.item()
        if isinstance(v, np.ndarray):
            return v.tolist()
        return str(v)
