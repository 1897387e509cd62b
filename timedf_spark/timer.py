"""Nested hierarchical wall-clock timer.

Capability parity with the reference's harness timer (timedf/timer.py:11-159):
nested stages produce dot-joined names ("total.load_data"), re-entering a
name accumulates, and results come back as a flat {name: seconds} dict.
Verbosity levels match the reference's VERBOSITY_LEVELS semantics
(timedf/timer.py:8,80-108): 0 silent; ≥1 prints each stage's duration at
exit; ≥2 also announces stage entry (indented by nesting depth); ≥3 wraps
each stage in a cProfile session and prints cumulative stats at exit.
Written fresh for Spark: because Spark is lazy, a timed stage only measures
real work if it ends with an action — see ``trigger`` in
timedf_spark.sources (SURVEY.md §4.1 "eager-timing vs lazy-fusion"). Note
on level 3 under Spark: cProfile sees only driver-side Python time — the
JVM/executor work shows up as time inside Py4J socket calls, which is still
useful to split "planning overhead in Python" from "cluster execution".
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

__all__ = ["Timer", "TimerError", "VERBOSITY_LEVELS"]

VERBOSITY_LEVELS = (0, 1, 2, 3)


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

    def __init__(self, verbosity: int = 0) -> None:
        if verbosity not in VERBOSITY_LEVELS:
            raise TimerError(
                f"verbosity={verbosity!r} not in {VERBOSITY_LEVELS}"
            )
        self._stack: list[str] = []
        self._acc: dict[str, float] = {}
        self.verbosity = verbosity

    @contextmanager
    def timeit(self, name: str) -> Iterator[None]:
        if not name or "." in name:
            raise TimerError(f"stage name must be non-empty and dot-free: {name!r}")
        self._stack.append(name)
        full = ".".join(self._stack)
        depth = len(self._stack) - 1
        if self.verbosity > 1:
            print("  " * depth + f"{full} started")
        profile = None
        if self.verbosity > 2:
            import cProfile

            profile = cProfile.Profile()
            profile.enable()
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            if profile is not None:
                profile.disable()
            self._acc[full] = self._acc.get(full, 0.0) + elapsed
            popped = self._stack.pop()
            assert popped == name
            if self.verbosity > 0:
                print("  " * depth + f"{full}: {self._acc[full]:.6f}")
            if profile is not None:
                from pstats import SortKey

                profile.print_stats(SortKey.CUMULATIVE)

    def results(self) -> dict[str, float]:
        """Flat {dot.joined.name: accumulated_seconds}; fails if stages are open."""
        if self._stack:
            raise TimerError(f"timers still running: {'.'.join(self._stack)}")
        return dict(self._acc)

    def reset(self) -> None:
        if self._stack:
            raise TimerError("cannot reset while timers are running")
        self._acc.clear()
