"""Nested hierarchical wall-clock timer.

Capability parity with the reference's harness timer (timedf/timer.py:11-159):
nested stages produce dot-joined names ("total.load_data"), re-entering a
name accumulates, and results come back as a flat {name: seconds} dict.
Written fresh for Spark: because Spark is lazy, a timed stage only measures
real work if it ends with an action — see ``trigger`` in
timedf_spark.sources (SURVEY.md §4.1 "eager-timing vs lazy-fusion").
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

__all__ = ["Timer", "TimerError"]


class TimerError(RuntimeError):
    pass


class Timer:
    """Hierarchical accumulating timer.

    >>> tm = Timer()
    >>> with tm.timeit("total"):
    ...     with tm.timeit("load"):
    ...         pass
    >>> sorted(tm.results())
    ['total', 'total.load']
    """

    def __init__(self) -> None:
        self._stack: list[str] = []
        self._acc: dict[str, float] = {}

    @contextmanager
    def timeit(self, name: str) -> Iterator[None]:
        if not name or "." in name:
            raise TimerError(f"stage name must be non-empty and dot-free: {name!r}")
        self._stack.append(name)
        full = ".".join(self._stack)
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self._acc[full] = self._acc.get(full, 0.0) + elapsed
            popped = self._stack.pop()
            assert popped == name

    def results(self) -> dict[str, float]:
        """Flat {dot.joined.name: accumulated_seconds}; fails if stages are open."""
        if self._stack:
            raise TimerError(f"timers still running: {'.'.join(self._stack)}")
        return dict(self._acc)

    def reset(self) -> None:
        if self._stack:
            raise TimerError("cannot reset while timers are running")
        self._acc.clear()
