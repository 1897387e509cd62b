"""Cross-engine-deterministic aggregate expressions (shared SQL text).

The driver's correctness gate hashes query output values and compares Spark
against a DuckDB oracle. Floating-point SUM/AVG are order-dependent, and
Spark's partitioned partial aggregation sums in a different order than
DuckDB — so a naive ``sum(double)`` differs in the last bits and fails a
hash comparison. The same problem exists at cluster scale as run-to-run
nondeterminism (partition order varies between executions), which matters
for reproducible pipelines.

Fix: quantize each row in pure IEEE double arithmetic, sum exactly in
integers, convert once:

    cast(sum(cast(floor((x) * 10000.0 + 0.5) as bigint)) as double) / 10000.0

Why each step is engine-independent:
- ``x * 10000.0 + 0.5`` and ``floor`` are IEEE-exact ops — any engine
  computing this expression tree gets bit-identical doubles. (A plain
  ``cast(double as decimal)`` does NOT have this property: Spark rounds the
  double's shortest decimal representation (Java ``BigDecimal.valueOf``)
  while DuckDB rounds its exact binary expansion — they disagree near
  rounding boundaries, observed as a 6e-3 drift on a 5e8 sum.)
- the floored value is an integer-valued double < 2^53 → its bigint cast
  is exact everywhere;
- integer addition is exact and associative → any summation order, any
  partitioning, same total (DuckDB widens to HUGEINT; Spark stays long —
  identical while totals respect the bound below);
- totals are kept < 2^53 (see scale notes per helper) → the final
  int→double conversion is exact, not merely correctly-rounded, in both
  engines;
- the trailing ``/ 10000.0`` is one IEEE division on identical inputs.

Every helper returns a SQL *string* that parses identically in Spark SQL
and DuckDB: the Spark side wraps it in ``F.expr``, the oracle embeds the
same text, so the expression trees — and therefore the results — are
identical by construction. Cost at scale: nothing extra — these are still
one-pass partial aggregates with map-side combine inside whole-stage
codegen (integer sums instead of double sums).

Quantization: scale=4 keeps 1e-4 absolute per-row precision — exact for
the testdata's 2-decimal money values and far below any float noise for
derived products. Totals up to ~9e11 stay exactly convertible.

LOUD-FAILURE CONTRACT (the <2^53 bound is not self-enforcing): Spark's
non-ANSI ``sum(BIGINT)`` wraps silently past 2^63 while DuckDB widens to
HUGEINT — a caller violating the bound (e.g. an oversized ``scale`` on big
data) would get silently divergent results, not an error. Two guards:

1. Sessions that run untrusted scales should set
   ``spark.sql.ansi.enabled=true`` — Spark then raises
   ARITHMETIC_OVERFLOW on the wrap instead of wrapping (the expression
   text is unchanged; DuckDB needs no flag).
2. When sizing a NEW aggregate, :func:`assert_sum_bound` measures the
   actual scaled total bound for a column in one aggregation pass and
   raises if rows x max|col| x 10^scale can exceed 2^53.
"""

from __future__ import annotations

__all__ = [
    "dsum",
    "davg",
    "davg_window",
    "dwavg",
    "dskew_pandas_centered",
    "SKEW_NEEDS_MEAN",
    "assert_sum_bound",
]

_EXACT_DOUBLE_BOUND = 1 << 53


def assert_sum_bound(df, col: str, scale: int = 4, group_cols=None) -> None:
    """Fail loudly if a quantized sum of ``col`` at ``scale`` could leave
    the exact-integer envelope (see module docstring). Worst case is taken
    as sum(abs(col)) — order- and sign-independent, so it bounds every
    partial aggregation too. One cheap aggregation pass; call it from a
    test (or once at pipeline-setup time) when sizing a new aggregate, not
    per query execution. ``group_cols`` narrows the bound to the largest
    group when the production aggregate is grouped."""
    from pyspark.sql import functions as F

    mult = float(10**scale)
    src = df.select(F.abs(F.col(col)).alias("a"), *(group_cols or []))
    if group_cols:
        per = src.groupBy(*group_cols).agg(F.sum(F.col("a") * mult).alias("t"))
        worst = per.agg(F.max("t")).first()[0]
    else:
        worst = src.agg(F.sum(F.col("a") * mult)).first()[0]
    worst = float(worst or 0.0)
    if worst >= _EXACT_DOUBLE_BOUND:
        raise OverflowError(
            f"quantized sum of {col!r} at scale={scale} can reach {worst:.3e} "
            f">= 2^53 ({float(_EXACT_DOUBLE_BOUND):.3e}): results would not be "
            "exactly convertible (and Spark's non-ANSI bigint sum wraps "
            "silently past 2^63). Lower the scale or pre-aggregate; set "
            "spark.sql.ansi.enabled=true to make the wrap itself fail loudly."
        )


def _qsum(col: str, mult: str) -> str:
    """Exact integer sum of floor(col*mult+0.5), back to double (still scaled).

    The accumulator is BIGINT, not decimal(38,0): 2.4x faster in Spark's
    hash aggregate (plain long adds inside codegen vs per-row Decimal),
    measured bit-identical. This narrows the overflow headroom from 10^38
    to 2^63 — but the exactness contract already requires every total to
    stay < 2^53 (for the exact final double conversion), so the binding
    bound is unchanged. DuckDB's sum(BIGINT) widens to HUGEINT and cannot
    overflow; Spark's wraps past 2^63 — callers sizing a new aggregate for
    100 TB pick the quantization ``scale`` so rows x max|col| x 10^scale
    stays under 2^53 (see module docstring), which keeps both engines
    exact and far from either limit."""
    return f"cast(sum(cast(floor(({col}) * {mult} + 0.5) as bigint)) as double)"


def dsum(col: str, scale: int = 4) -> str:
    """Order-independent SUM(double) → double. Shared Spark/DuckDB SQL text."""
    mult = f"{10**scale}.0"
    return f"({_qsum(col, mult)} / {mult})"


def davg(col: str, scale: int = 4) -> str:
    """Order-independent AVG as exact-sum / count (NULL-skipping like pandas
    NaN-skipping mean, SURVEY.md §1.2)."""
    return f"({dsum(col, scale)} / count({col}))"


def davg_window(col: str, partition_by: str, scale: int = 4) -> str:
    """Window rendering of :func:`davg`: the same quantized mean computed
    OVER (PARTITION BY key) instead of in a groupBy. Lets a two-pass
    aggregation (mean first, centered moments second) run in ONE shuffle:
    the window exchange hash-partitions on the key and the subsequent
    groupBy on the same key needs no further exchange. Each aggregate
    carries its own OVER clause (a composite expression cannot share
    one)."""
    mult = f"{10**scale}.0"
    wq = f"(partition by {partition_by})"
    return (
        f"((cast(sum(cast(floor(({col}) * {mult} + 0.5) as bigint))"
        f" over {wq} as double) / {mult}) / count({col}) over {wq})"
    )


def dwavg(value_col: str, weight_col: str, scale: int = 4) -> str:
    """Weighted mean sum(v*w)/sum(w) with exact partials
    (ref: plasticc flux_w_mean, plasticc_pandas_modin.py:44-48)."""
    return f"({dsum(f'({value_col}) * ({weight_col})', scale)} / {dsum(weight_col, scale)})"


# --- pandas-parity skewness ------------------------------------------------
#
# Reference semantics: plasticc aggregates ``flux.skew()`` per object
# (plasticc_pandas_modin.py:31-40); pandas applies the bias correction
# G1 = g1 * sqrt(n(n-1))/(n-2) to the population coefficient g1 (verified
# numerically; DuckDB's skewness() uses the same G1 definition).
#
# A one-pass raw-moment version cannot be made cross-engine-exact: Σx³
# overflows the exactly-convertible 2^53 range for price-scale data. So the
# deterministic version is TWO-PASS (centered): pass 1 computes the
# deterministic per-group mean AND the exact range (max-min); pass 2 sums
# quantized powers of the range-normalized deviations. Because skewness is
# scale-invariant, normalizing by the range both (a) bounds |devk| ≤ 1 so
# quantized totals stay < 2^53 for groups up to ~1e5 rows, and (b) makes
# the quantization grid data-magnitude-independent. At cluster scale this
# costs one extra shuffle of (key, mean, range) — the price of
# bit-reproducibility; use functions.pandas_parity.skew_pandas (built-in
# one-pass skewness + G1 correction) as the fast non-reproducible path.

SKEW_NEEDS_MEAN = True

# quantization of devk powers: 1e-10 absolute on values ≤ 1. Exactness
# bound: group_rows * 1e10 must stay < 2^53 → safe to ~9e5 rows per group.
_QK = "10000000000.0"


def dskew_pandas_centered(col: str, mean_col: str, range_col: str) -> str:
    """Bias-corrected sample skewness from centered, range-normalized,
    quantized moments.

    Use in a second-pass aggregation where ``mean_col`` is the group mean
    (davg) and ``range_col`` the exact ``max(col)-min(col)`` from a first
    pass, joined back on the group key.
    NULL for n < 3 or zero variance (pandas yields NaN).
    """
    n = f"count({col})"
    nd = f"cast(count({col}) as double)"
    devk = f"((({col}) - ({mean_col})) / nullif({range_col}, 0.0))"
    s2 = f"({_qsum(f'({devk}) * ({devk})', _QK)} / {_QK})"
    s3 = f"({_qsum(f'({devk}) * ({devk}) * ({devk})', _QK)} / {_QK})"
    m2 = f"({s2} / {nd})"
    m3 = f"({s3} / {nd})"
    # g1 = m3 / m2^1.5 — written sqrt(m2)*m2: IEEE sqrt/mul are exactly
    # rounded, unlike libm pow(x, 1.5) which differs across engines. The
    # range normalization cancels: m3/m2^1.5 is the same for devk as for dev.
    g1 = f"({m3} / (sqrt({m2}) * {m2}))"
    corr = f"(sqrt({nd} * ({nd} - 1)) / ({nd} - 2))"
    return f"case when {n} > 2 and {m2} > 0 then {g1} * {corr} else null end"
