"""Observability subsystems: profiling/tracing and metrics logging.

The reference has none of this beyond ad-hoc ``time.time()`` prints and raw
``print`` counters (SURVEY.md §5); here tracing and metrics are first-class:
``profiling.trace``/``annotate`` produce Perfetto traces via ``jax.profiler``,
``metrics.MetricsLogger`` writes structured JSONL the pipelines and trainers
append to.
"""
from . import metrics, profiling  # noqa: F401
