"""Structured metrics logging + profiling hooks.

Replaces the reference's print()/tqdm-only observability (SURVEY.md §5):
every record is one JSON line (machine-parseable) plus an optional pretty
line. ``examples_per_sec`` is the north-star throughput metric.
``trace()`` wraps ``jax.profiler`` for on-demand device traces.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any


class MetricsLogger:
    def __init__(self, stream=None, pretty: bool = True):
        self.stream = stream or sys.stdout
        self.pretty = pretty
        self.history: list[dict[str, Any]] = []

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "time": time.time(), **fields}
        self.history.append(rec)
        line = json.dumps({k: _jsonable(v) for k, v in rec.items()})
        print(line, file=self.stream, flush=True)

    def log_epoch(self, epoch: int, **fields: Any) -> None:
        self.log("epoch", epoch=epoch, **fields)


def _jsonable(v: Any) -> Any:
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with warmup exclusion.

    NOTE: on the tunnel TPU backend, wrap a hard host sync (np.asarray of a
    result) inside the timed region — block_until_ready can return early
    there (see CLAUDE.md)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: float | None = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]
