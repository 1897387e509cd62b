"""Timer unit tests — capability parity with timedf/test_timer.py:9-113
(nested naming, accumulation, error states, reset), written fresh."""

from __future__ import annotations

import time

import pytest

from timedf_spark.timer import Timer, TimerError


def test_nested_names_and_accuracy():
    tm = Timer()
    with tm.timeit("total"):
        with tm.timeit("load"):
            time.sleep(0.02)
        with tm.timeit("query"):
            time.sleep(0.01)
    res = tm.results()
    assert set(res) == {"total", "total.load", "total.query"}
    assert res["total"] >= res["total.load"] + res["total.query"] - 1e-4
    assert res["total.load"] == pytest.approx(0.02, abs=0.05)


def test_accumulation():
    tm = Timer()
    for _ in range(3):
        with tm.timeit("stage"):
            time.sleep(0.005)
    assert tm.results()["stage"] >= 0.015


def test_results_while_open_raises():
    tm = Timer()
    with pytest.raises(TimerError):
        with tm.timeit("a"):
            tm.results()


def test_bad_name_raises():
    tm = Timer()
    with pytest.raises(TimerError):
        with tm.timeit("a.b"):
            pass


def test_reset():
    tm = Timer()
    with tm.timeit("a"):
        pass
    tm.reset()
    assert tm.results() == {}


def test_entry_contract(spark):
    """Driver smoke: entry() runs and returns rows with a stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 17


def test_timer_verbosity_levels(capsys):
    """L1 parity with the reference's VERBOSITY_LEVELS
    (timedf/timer.py:8,80-108): 1 → durations at exit; 2 → entry
    announcements indented by depth; 3 → cProfile cumulative stats."""
    import pytest

    from timedf_spark.timer import Timer, TimerError

    with pytest.raises(TimerError):
        Timer(verbosity=7)

    tm = Timer(verbosity=1)
    with tm.timeit("total"):
        with tm.timeit("inner"):
            pass
    out = capsys.readouterr().out
    assert "total.inner:" in out and "total:" in out
    assert "started" not in out

    tm = Timer(verbosity=2)
    with tm.timeit("total"):
        with tm.timeit("inner"):
            pass
    out = capsys.readouterr().out
    assert "total started" in out
    assert "  total.inner started" in out  # depth-indented

    tm = Timer(verbosity=3)
    with tm.timeit("total"):
        sum(range(1000))
    out = capsys.readouterr().out
    assert "cumulative" in out  # pstats table printed
