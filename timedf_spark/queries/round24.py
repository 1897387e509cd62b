"""Round-24 queries: sequence mining, financial-style drawdown, time-
weighted averages, incremental view maintenance, sorted-neighborhood
entity blocking, and burstiness profiling.

Scale posture (the 100 TB lens, per query):

- ``event_type_trigrams`` — consecutive event-type trigrams per user via
  two ``lead()``s over the (user_id)-partitioned time order: the
  sequence never leaves its partition, no self-join, one exchange for
  the window and one for the trigram count (PrefixSpan's length-3
  contiguous special case, which is what funnel diagnostics actually
  read).

- ``customer_drawdown`` — classic max-drawdown (running-max minus
  running-sum) per customer over order history: both windows share ONE
  (c_custkey)-partitioned sort; cents arithmetic is exact int64.

- ``twap_value`` — time-weighted average value per event type, weight =
  µs gap to the next event of that type (the irregular-sampling-robust
  mean finance calls TWAP). All-int64: Σ(v·gap) and Σgap are exact, the
  ratio is the acf-style guarded truncating division — overflow-safe
  because the DIVISOR is pre-scaled down, never the dividend up.

- ``ivm_join_delta`` — incremental view maintenance of the orders ⋈
  customer view under a two-sided insert batch: the textbook delta
  identity Δ(O ⋈ C) = ΔO⋈C₀ ∪ O₀⋈ΔC ∪ ΔO⋈ΔC. The Spark side computes
  ONLY delta-sized joins (ΔC broadcasts — at 100 TB the view refresh
  touches the delta, never the base fact table); the DuckDB oracle
  recomputes the full view and EXCEPT ALLs the base view — so the
  driver's hash equality IS the IVM correctness proof.

- ``sorted_neighborhood_pairs`` — entity-resolution candidate blocking
  (Hernández & Stolfo's sorted-neighborhood method) WITHOUT a
  self-join: parts sort within (brand) blocks and each row pairs with
  its next-w neighbors via ``lead()`` — the candidate stream unfolds
  from one partitioned window, O(w) pairs per row, no quadratic
  anything, and the blocks are the shuffle keys so one hot brand is
  bounded by block size, not table size.

- ``fano_burstiness`` — per-type Fano factor (variance/mean of
  per-minute event counts, the standard burst detector): zero-count
  minutes enter through the SPAN (n = minutes between first and last
  event), so only observed minutes aggregate; all moments are exact
  int64 and the final ratio is the guarded truncating division.

Reference parity: none of these exist in intel-ai/timedf (no sequence,
IVM, blocking, or burstiness surface; SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# event_type_trigrams

_TRIGRAM_TOPN = 30


def event_type_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t3").isNotNull())
    )
    return (
        tri.groupBy(F.col("event_type").alias("t1"), "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(_TRIGRAM_TOPN)
    )


TRIGRAMS_ORACLE = f"""
WITH s AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
)
SELECT t1, t2, t3, count(*) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n DESC, t1, t2, t3
LIMIT {_TRIGRAM_TOPN}
"""

# --------------------------------------------------------------------
# customer_drawdown

_DRAWDOWN_TOPN = 100


def customer_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of cumulative order spend per customer (cents-exact).
    floor(price*100) is the shared float→cents quantization: floor (not
    cast) because Spark's bigint cast truncates while DuckDB's rounds."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = seq.rowsBetween(Window.unboundedPreceding, 0)
    # drawdown of the CENTERED series y_t = t*avg - cum is scale-free in
    # spend; use the plain cumulative-minus-peak on signed deltas around
    # the per-customer mean so both engines share exact integer algebra:
    # delta_t = n*cents_t - total (the acf_daily centering trick)
    grp = Window.partitionBy("o_custkey")
    o = (
        o.withColumn("n", F.count(F.lit(1)).over(grp))
        .withColumn("total", F.sum("cents").over(grp))
        .withColumn("y", F.col("n") * F.col("cents") - F.col("total"))
    )
    o = o.withColumn("cum", F.sum("y").over(run)).withColumn(
        "peak", F.max("cum").over(run)
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("peak") - F.col("cum")).alias("max_drawdown"),
            F.max("n").alias("n_orders"),
        )
        .where(F.col("max_drawdown") > 0)
        .orderBy(F.desc("max_drawdown"), "o_custkey")
        .limit(_DRAWDOWN_TOPN)
    )


DRAWDOWN_ORACLE = f"""
WITH base AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), centered AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         count(*) OVER (PARTITION BY o_custkey) AS n,
         count(*) OVER (PARTITION BY o_custkey) * cents
           - sum(cents) OVER (PARTITION BY o_custkey) AS y
  FROM base
), runs AS (
  SELECT o_custkey, o_orderdate, o_orderkey, n,
         sum(y) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM centered
), peaks AS (
  SELECT o_custkey, n, cum,
         max(cum) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM runs
)
SELECT o_custkey, CAST(max(peak - cum) AS BIGINT) AS max_drawdown,
       CAST(max(n) AS BIGINT) AS n_orders
FROM peaks
GROUP BY o_custkey
HAVING max(peak - cum) > 0
ORDER BY max_drawdown DESC, o_custkey
LIMIT {_DRAWDOWN_TOPN}
"""

# --------------------------------------------------------------------
# twap_value

_TWAP_SCALE = 10_000


def twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.floor("value").cast("long").alias("vq"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = ev.withColumn("gap", F.lead("us").over(w) - F.col("us")).where(
        F.col("gap").isNotNull()
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum(F.col("vq") * F.col("gap")).alias("wsum"),
            F.sum("gap").alias("gsum"),
        )
        .select(
            "event_type",
            "n_gaps",
            F.expr(f"wsum DIV greatest(gsum DIV {_TWAP_SCALE}, 1)").alias(
                "twap_scaled"
            ),
        )
        .orderBy("event_type")
    )


TWAP_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         CAST(floor(value) AS BIGINT) AS vq,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
           - epoch_us(ts) AS gap
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       CAST(sum(vq * gap) // greatest(sum(gap) // {_TWAP_SCALE}, 1) AS BIGINT)
         AS twap_scaled
FROM g WHERE gap IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

# --------------------------------------------------------------------
# ivm_join_delta

_DELTA_O = "o_orderkey % 17 = 3"
_DELTA_C = "c_custkey % 13 = 5"


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View delta of orders ⋈ customer under a two-sided insert batch via
    the IVM identity Δ(O⋈C) = ΔO⋈C₀ ∪ O₀⋈ΔC ∪ ΔO⋈ΔC — only delta-sized
    joins execute (ΔC broadcasts); the oracle recomputes and diffs."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("price_cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    d_o = o.where(_DELTA_O)
    o0 = o.where(f"NOT ({_DELTA_O})")
    d_c = c.where(_DELTA_C)
    c0 = c.where(f"NOT ({_DELTA_C})")

    def j(lo: DataFrame, rc: DataFrame, broadcast_right: bool) -> DataFrame:
        rc = F.broadcast(rc) if broadcast_right else rc
        return lo.join(rc, lo.o_custkey == rc.c_custkey).select(
            "o_orderkey", "o_custkey", "price_cents", "c_mktsegment"
        )

    delta = (
        j(d_o, c0, broadcast_right=False)
        .unionByName(j(o0, d_c, broadcast_right=True))
        .unionByName(j(d_o, d_c, broadcast_right=True))
    )
    return delta


IVM_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
EXCEPT ALL
SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents, c_mktsegment
FROM (SELECT * FROM orders WHERE NOT ({_DELTA_O})) o
JOIN (SELECT * FROM customer WHERE NOT ({_DELTA_C})) c ON o_custkey = c_custkey
"""

# --------------------------------------------------------------------
# sorted_neighborhood_pairs

_SN_WINDOW = 2
_SN_MAX_GAP_CENTS = 300


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.expr("CAST(floor(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("p_brand").orderBy("p_type", "p_size", "cents", "p_partkey")
    # all w leads in ONE window pass, then the pair stream unfolds from an
    # array — one sort, one Generate, no union re-sorting the block
    nb = p.select(
        "p_brand",
        F.col("p_partkey").alias("key_a"),
        "cents",
        *[F.lead("p_partkey", i).over(w).alias(f"k{i}") for i in range(1, _SN_WINDOW + 1)],
        *[F.lead("cents", i).over(w).alias(f"c{i}") for i in range(1, _SN_WINDOW + 1)],
    )
    pairs = nb.select(
        "p_brand",
        "key_a",
        "cents",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"k{i}").alias("key_b"), F.col(f"c{i}").alias("cents_b")
                    )
                    for i in range(1, _SN_WINDOW + 1)
                ]
            )
        ).alias("nb"),
    )
    return (
        pairs.where(
            F.col("nb.key_b").isNotNull()
            & (F.abs(F.col("cents") - F.col("nb.cents_b")) <= _SN_MAX_GAP_CENTS)
        )
        .select(
            "p_brand",
            "key_a",
            F.col("nb.key_b").alias("key_b"),
            F.abs(F.col("cents") - F.col("nb.cents_b")).alias("gap_cents"),
        )
        .orderBy("p_brand", "key_a", "key_b")
    )


SN_ORACLE = f"""
WITH base AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         CAST(floor(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
), nb AS (
  SELECT p_brand, p_partkey AS key_a, cents,
         lead(p_partkey, 1) OVER w AS k1, lead(cents, 1) OVER w AS c1,
         lead(p_partkey, 2) OVER w AS k2, lead(cents, 2) OVER w AS c2
  FROM base
  WINDOW w AS (PARTITION BY p_brand ORDER BY p_type, p_size, cents, p_partkey)
)
SELECT p_brand, key_a, key_b, gap_cents FROM (
  SELECT p_brand, key_a, k1 AS key_b, abs(cents - c1) AS gap_cents FROM nb
  UNION ALL
  SELECT p_brand, key_a, k2 AS key_b, abs(cents - c2) AS gap_cents FROM nb
)
WHERE key_b IS NOT NULL AND gap_cents <= {_SN_MAX_GAP_CENTS}
ORDER BY p_brand, key_a, key_b
"""

# --------------------------------------------------------------------
# fano_burstiness

_FANO_SCALE = 10_000
_MIN_US = 60_000_000


def fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"unix_micros(ts) DIV {_MIN_US}").alias("minute")
    )
    per_min = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_min.groupBy("event_type")
        .agg(
            (F.max("minute") - F.min("minute") + 1).alias("n_minutes"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .select(
            "event_type",
            "n_minutes",
            "s",
            # Fano = var/mean over the FULL span (zero minutes implicit):
            # var*n²... algebra: mean m = s/n; var v = (s2 - s²/n)/(n-1)
            # → fano_scaled = SCALE * (n*s2 - s²) DIV ((n-1) * s), all int
            F.expr(
                f"(n_minutes * s2 - s * s) DIV "
                f"greatest(((n_minutes - 1) * s) DIV {_FANO_SCALE}, 1)"
            ).alias("fano_scaled"),
        )
        .orderBy("event_type")
    )


FANO_ORACLE = f"""
WITH m AS (
  SELECT event_type, epoch_us(ts) // {_MIN_US} AS minute, count(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         max(minute) - min(minute) + 1 AS n_minutes,
         sum(c) AS s, sum(c * c) AS s2
  FROM m GROUP BY event_type
)
SELECT event_type, CAST(n_minutes AS BIGINT) AS n_minutes, CAST(s AS BIGINT) AS s,
       CAST((n_minutes * s2 - s * s)
         // greatest(((n_minutes - 1) * s) // {_FANO_SCALE}, 1) AS BIGINT)
         AS fano_scaled
FROM agg
ORDER BY event_type
"""


SUITE = {
    "event_type_trigrams": QuerySpec(
        "event_type_trigrams",
        event_type_trigrams,
        TRIGRAMS_ORACLE,
        "consecutive event trigrams per user via two lead()s — contiguous PrefixSpan-3, no self-join",
    ),
    "customer_drawdown": QuerySpec(
        "customer_drawdown",
        customer_drawdown,
        DRAWDOWN_ORACLE,
        "max drawdown of centered cumulative spend per customer; one partitioned sort, cents-exact",
    ),
    "twap_value": QuerySpec(
        "twap_value",
        twap_value,
        TWAP_ORACLE,
        "time-weighted average value per type (µs-gap weights, guarded integer division)",
    ),
    "ivm_join_delta": QuerySpec(
        "ivm_join_delta",
        ivm_join_delta,
        IVM_ORACLE,
        "incremental view maintenance delta (delta-sized joins) == oracle's recompute-and-diff",
    ),
    "sorted_neighborhood_pairs": QuerySpec(
        "sorted_neighborhood_pairs",
        sorted_neighborhood_pairs,
        SN_ORACLE,
        "sorted-neighborhood ER blocking via lead() windows — O(w) candidates/row, no self-join",
    ),
    "fano_burstiness": QuerySpec(
        "fano_burstiness",
        fano_burstiness,
        FANO_ORACLE,
        "per-type Fano factor over minute buckets (burst detector), exact integer moments",
    ),
}
