"""Property-based tests (hypothesis) for the engine-independent kernels —
the pieces whose guarantees the whole oracle methodology rests on
(SURVEY.md §5: cross-backend validation depends on these being exact).

JVM-free: the deterministic-aggregate properties are checked through
DuckDB (same SQL text the Spark side executes via F.expr), so hundreds of
hypothesis examples run in milliseconds. The Spark side of the same
expressions is covered by the 100+ differential oracle queries.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from timedf_spark.functions.deterministic import davg, dsum
from timedf_spark.report.minixlsx import area_ref, cell_ref, col_letter

# 2-decimal "money" values in the testdata's magnitude envelope
money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


def _duck_agg(expr: str, values: list[Decimal]) -> float:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x double)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in values])
    out = con.execute(f"SELECT {expr} FROM t").fetchone()[0]
    con.close()
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_dsum_is_exact_at_scale4(xs):
    """The quantized sum must equal the EXACT decimal sum for 2-decimal
    inputs — not merely approximate it: scale=4 over-resolves 2-decimal
    money, so floor(x*1e4 + 0.5) recovers each addend exactly."""
    got = _duck_agg(dsum("x"), xs)
    want = float(sum(xs))
    assert got == want, (got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(money, min_size=1, max_size=40), st.randoms())
def test_dsum_is_order_invariant(xs, rnd):
    """Any permutation — i.e. any partitioning/merge order an engine might
    choose — must produce the bit-identical double."""
    a = _duck_agg(dsum("x"), xs)
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    b = _duck_agg(dsum("x"), shuffled)
    assert a == b


@settings(max_examples=100, deadline=None)
@given(st.lists(money, min_size=1, max_size=40))
def test_davg_matches_exact_mean_to_one_division(xs):
    """davg = exact integer sum then ONE IEEE division — so it must equal
    float(exact_sum) / n exactly (the single correctly-rounded division
    both engines perform on identical inputs)."""
    got = _duck_agg(davg("x"), xs)
    want = float(sum(xs)) / len(xs)
    assert got == want or (math.isnan(got) and math.isnan(want))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=20_000))
def test_col_letter_bijective(c):
    """A1-reference letters must be unique and reversible (chart formulas
    depend on unambiguous cell addressing)."""
    s = col_letter(c)
    assert s.isalpha() and s.isupper()
    # invert
    acc = 0
    for ch in s:
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    assert acc - 1 == c


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=100),
)
def test_cell_and_area_refs_shape(r, c):
    ref = cell_ref(r, c)
    assert ref == f"{col_letter(c)}{r + 1}"
    area = area_ref("S", r, c, r + 1, c + 2)
    assert area == f"'S'!${col_letter(c)}${r + 1}:${col_letter(c + 2)}${r + 2}"


# ---- z-order (Morton) interleave -------------------------------------------
#
# The layout guarantee (sources/zorder.py) rests on the interleave being a
# BIJECTION that preserves per-dimension order within fixed other-dimension
# values — pinned here in pure Python against the same mask cascade the
# Spark expressions implement.


def _spread16(x: int) -> int:
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _morton(a: int, b: int) -> int:
    return _spread16(a) | (_spread16(b) << 1)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=0xFFFF),
    st.integers(min_value=0, max_value=0xFFFF),
)
def test_morton_interleave_is_bijective(a, b):
    z = _morton(a, b)
    # de-interleave: even bits → a, odd bits → b
    da = db = 0
    for i in range(16):
        da |= ((z >> (2 * i)) & 1) << i
        db |= ((z >> (2 * i + 1)) & 1) << i
    assert (da, db) == (a, b)
    assert 0 <= z < (1 << 32)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=0xFFFE),
    st.integers(min_value=0, max_value=0xFFFF),
)
def test_morton_monotone_per_dimension(a, b):
    # fixing one dimension, the curve index grows with the other — the
    # property that makes footer min/max ranges tight per dimension
    assert _morton(a, b) < _morton(a + 1, b)
    assert _morton(b, a) < _morton(b, a + 1)


def test_morton_matches_spark_expression(spark):
    """The pure-Python model above IS the Spark expression: compare on a
    grid of values through the actual zorder_key column."""
    import pyspark.sql.functions as F

    from timedf_spark.sources.zorder import _spread_bits_16

    vals = [0, 1, 2, 255, 256, 32767, 65535]
    df = spark.createDataFrame([(a, b) for a in vals for b in vals], "a long, b long")
    got = df.select(
        "a", "b",
        (_spread_bits_16(F.col("a")).bitwiseOR(
            F.shiftleft(_spread_bits_16(F.col("b")), 1))).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _morton(r["a"], r["b"]), (r["a"], r["b"])
