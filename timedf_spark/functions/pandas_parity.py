"""Expressions closing the pandas-semantics gaps (SURVEY.md §4.2).

These are the only places where "same capabilities as the reference" is not
a direct Spark built-in. Each is a pure Column expression — JVM-side, inside
whole-stage codegen, no UDFs — so they cost the same as hand-written SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["skew_pandas", "ts_to_ns_epoch", "floor_div"]


def skew_pandas(col: Column | str) -> Column:
    """Bias-corrected sample skewness (pandas ``Series.skew()`` / G1).

    The reference's plasticc workload aggregates ``flux.skew()`` per object
    (plasticc_pandas_modin.py:31-40). Spark's ``skewness`` is the population
    coefficient g1; pandas (and DuckDB's ``skewness``) apply the bias
    correction G1 = g1 * sqrt(n*(n-1)) / (n-2). Verified numerically against
    pandas in tests/test_functions.py. NULL when n < 3 (pandas returns NaN).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    g1 = F.skewness(c)
    correction = F.sqrt(n * (n - F.lit(1))) / (n - F.lit(2))
    return F.when(n > 2, g1 * correction).otherwise(F.lit(None))


def ts_to_ns_epoch(col: Column | str) -> Column:
    """Timestamp → int64 epoch **nanoseconds** (pandas ``ts.astype('int64')``).

    The reference derives trip duration from ns-epoch ints
    (ny_taxi_ml.py:174). Spark's cast-to-long yields seconds — wrong by 1e9;
    ``unix_micros`` is exact for Spark's µs-precision timestamps.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c) * F.lit(1000)


def floor_div(col: Column | str, divisor: float) -> Column:
    """Float floor-division keeping float dtype (pandas ``df[cols] // x``).

    The reference grids lat/lon cells via ``// (0.01*0.01)``
    (ny_taxi_ml.py:176-177). Two pandas-parity subtleties: (a) pandas ``//``
    on float64 returns float64, so the result is cast back to double, not
    long; (b) numpy implements floor_divide via divmod — ``(a - mod(a,b))/b``
    with a floor-positive mod — which can differ by one cell from a naive
    ``floor(a/b)`` when a/b lands within a ulp of an integer (verified in
    tests/test_functions.py). The quotient is integral by construction, so
    the trailing floor(q + 0.5) only snaps rounding noise.
    """
    c = F.col(col) if isinstance(col, str) else col
    b = F.lit(float(divisor))
    q = (c - F.pmod(c, b)) / b
    return F.floor(q + F.lit(0.5)).cast("double")
