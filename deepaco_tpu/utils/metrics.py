"""Observability: structured metrics logging + profiler hooks.

The reference's observability is ``print`` + notebook live plots + wall-clock
spans (SURVEY §5 Tracing/Metrics: tsp/train.ipynb cell 3,
cvrp_nls/train.py:57-64). Here:

* :class:`MetricsLogger` — append-only JSONL event stream (step metrics,
  phase durations, eval curves) with wall-clock timestamps;
* :func:`phase` — context manager that both times a named phase and emits a
  ``jax.profiler.TraceAnnotation`` so device traces show GNN / rollout / LS /
  update spans;
* :func:`trace` — wraps ``jax.profiler.start_trace/stop_trace`` for capturing
  a TensorBoard-compatible device profile of any code region.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Iterator

import jax


class MetricsLogger:
    """Append-only JSONL metrics stream; one event per line."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._fh = None
        self.events: list[dict] = []
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "t": round(time.time() - self._t0, 4), **fields}
        self.events.append(rec)
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def phase(name: str, logger: MetricsLogger | None = None,
          sync: bool = False) -> Iterator[None]:
    """Time a named phase; annotate it in device profiles.

    ``sync=True`` blocks on outstanding device work before/after so the span
    reflects device time (at the cost of breaking dispatch pipelining).
    """
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    if logger is not None:
        logger.log("phase", name=name,
                   duration_s=round(time.perf_counter() - t0, 6))


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device profile into ``logdir`` (TensorBoard 'profile' tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
