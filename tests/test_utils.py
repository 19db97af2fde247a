"""Observability subsystem (utils/): metrics JSONL and profiling hooks."""
import json
import os

import jax.numpy as jnp

from catgrasp_tpu.utils.metrics import MetricsLogger
from catgrasp_tpu.utils import profiling


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path, run="t") as log:
        log.event("attempt", round=0, picked=True, score=jnp.float32(0.5))
        log.incr("picks")
        log.incr("picks")
        log.gauge("loss", 0.25)
    lines = [json.loads(l) for l in open(path)]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["attempt", "gauge", "summary"]
    assert lines[0]["picked"] is True and lines[0]["run"] == "t"
    assert abs(lines[0]["score"] - 0.5) < 1e-6  # jnp scalar serialized
    assert lines[-1]["picks"] == 2


def test_metrics_logger_no_path_is_noop():
    log = MetricsLogger(None)
    log.event("x", a=1)
    log.close()  # no file, no crash


def test_stopwatch_sections():
    sw = profiling.Stopwatch()
    with sw.section("a"):
        sum(range(1000))
    with sw.section("a"):
        pass
    rep = sw.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["total_s"] >= 0


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("CATGRASP_TRACE_DIR", raising=False)
    with profiling.trace() as d:
        assert d is None


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("square"):
            (jnp.ones((64, 64)) ** 2).block_until_ready()
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz under logdir
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if "trace" in f or f.endswith(".xplane.pb")]
    assert found, "no trace artifacts written"
