"""Structured JSONL event logging + profiling hooks.

The reference's observability is print-based (SURVEY §5.5: per-50-batch loss
prints, boxed performance blocks, append-mode result files). This framework
adds a structured event stream alongside:

  * ``EventLog`` appends one JSON object per event to
    ``$COLDREC_EVENT_LOG`` (or a given path): run metadata, per-epoch loss
    summaries, eval metrics, early-stop transitions, timings.
  * ``trace`` context manager wraps a block in ``jax.profiler`` tracing when
    ``COLDREC_PROFILE_DIR`` is set — open the trace in XProf/TensorBoard.

Both are no-ops unless enabled, so the default run stays print-compatible
with the reference.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class EventLog:
    def __init__(self, path: Optional[str] = None):
        self.path = path or os.environ.get("COLDREC_EVENT_LOG")
        self._fh = open(self.path, "a", buffering=1) if self.path else None

    def emit(self, event: str, **fields):
        if self._fh is None:
            return
        rec = {"ts": round(time.time(), 3), "event": event}
        rec.update(fields)
        self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


_global_log: Optional[EventLog] = None


def event_log() -> EventLog:
    global _global_log
    if _global_log is None:
        _global_log = EventLog()
    return _global_log


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler trace scope, active only when COLDREC_PROFILE_DIR set."""
    profile_dir = os.environ.get("COLDREC_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def step_timer(log: EventLog, event: str, **fields):
    t0 = time.perf_counter()
    yield
    log.emit(event, seconds=round(time.perf_counter() - t0, 6), **fields)
