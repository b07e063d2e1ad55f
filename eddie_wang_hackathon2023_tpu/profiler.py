"""Tag-based wall-clock profiler.

Counterpart of the reference's ``tensorrt_llm/profiler.py:4-55`` (Timer with
start/stop/elapsed_time_in_sec/summary), extended with a context manager and
an optional bridge into :func:`jax.profiler.trace` for device-level traces
(the reference defers kernel-level tracing to nsys; we defer to Perfetto).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timer:

    def __init__(self):
        self._start_times = {}
        self._total_elapsed_times = defaultdict(float)

    def start(self, tag: str) -> None:
        self._start_times[tag] = time.perf_counter()

    def stop(self, tag: str) -> float:
        elapsed = time.perf_counter() - self._start_times[tag]
        self._total_elapsed_times[tag] += elapsed
        return elapsed

    def elapsed_time_in_sec(self, tag: str):
        if tag not in self._total_elapsed_times:
            return None
        return self._total_elapsed_times[tag]

    def reset(self) -> None:
        self._start_times.clear()
        self._total_elapsed_times.clear()

    def summary(self) -> str:
        lines = ["Profile Results"]
        for tag, elapsed in self._total_elapsed_times.items():
            lines.append(f" - {tag.ljust(30, '.')}: {elapsed:.6f} (sec)")
        return "\n".join(lines)


_default_timer = Timer()


def start(tag: str) -> None:
    _default_timer.start(tag)


def stop(tag: str) -> float:
    return _default_timer.stop(tag)


def elapsed_time_in_sec(tag: str):
    return _default_timer.elapsed_time_in_sec(tag)


def reset() -> None:
    _default_timer.reset()


def summary() -> str:
    return _default_timer.summary()


@contextlib.contextmanager
def scope(tag: str):
    """``with profiler.scope('encode'): ...`` wall-clock scope."""
    start(tag)
    try:
        yield
    finally:
        stop(tag)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
