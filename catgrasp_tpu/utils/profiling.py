"""Tracing & profiling — the subsystem the reference lacks entirely
(ad-hoc ``time.time()`` prints at ``env.py:392,435``, ``trainer_grasp.py:105``
and a dangling torchprof import are all it has; SURVEY.md §5).

Three layers:
  * ``trace(logdir)``    — whole-program Perfetto/TensorBoard trace via
                           ``jax.profiler`` (open in Perfetto UI or xprof).
  * ``annotate(name)``   — named region that shows up inside device traces
                           (TraceAnnotation) AND in XLA HLO metadata
                           (named_scope), nestable.
  * ``Stopwatch``        — lightweight host-side wall-time accumulator for
                           pipeline stage reporting; blocks on device work so
                           numbers mean what they say.

All are no-ops unless enabled, so they can stay in production call sites.
Enable ambiently with ``CATGRASP_TRACE_DIR=/tmp/trace``.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a device+host profile for the enclosed block.

    ``logdir=None`` consults ``CATGRASP_TRACE_DIR``; if neither is set this
    is a no-op, so call sites can wrap their hot loops unconditionally.
    """
    logdir = logdir or os.environ.get("CATGRASP_TRACE_DIR")
    if not logdir:
        yield None
        return
    with jax.profiler.trace(logdir):
        yield logdir


@contextlib.contextmanager
def annotate(name: str):
    """Nestable named region: shows in device timelines and HLO metadata."""
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


class Stopwatch:
    """Accumulating section timer: ``with sw.section("render"): ...``.

    Calls ``block_until_ready``-free timing by default; pass pytrees to
    ``section(..., block=x)`` to include device completion in the measure.
    """

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": round(self.total[k], 4),
                    "calls": self.count[k],
                    "mean_ms": round(1e3 * self.total[k] / max(self.count[k], 1), 3)}
                for k in sorted(self.total)}

    def __str__(self):
        return json.dumps(self.report(), indent=None)
