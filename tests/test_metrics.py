"""Metrics/profiler hooks tests."""
import json
import os
import tempfile

import jax.numpy as jnp

from deepaco_tpu.utils.metrics import MetricsLogger, phase


def test_jsonl_stream_and_phase_timer():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "metrics.jsonl")
        log = MetricsLogger(path)
        log.log("train_step", step=1, cost=3.14)
        with phase("rollout", log):
            _ = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        log.close()
        lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "train_step" and lines[0]["cost"] == 3.14
    assert lines[1]["event"] == "phase" and lines[1]["name"] == "rollout"
    assert lines[1]["duration_s"] >= 0


def test_logger_without_file():
    log = MetricsLogger()
    log.log("x", a=1)
    assert log.events[0]["a"] == 1
