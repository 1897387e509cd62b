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
