"""Round-14 queries: set-combination census, weighted median, wavelet
energy, and a physical-layout advisor.

- ``engagement_upset`` — the UpSet/Venn census: per user, the bitmask
  of distinct event types they triggered; per bitmask, how many users.
  The engagement-mix profile a pipeline uses to stratify users before
  sampling (all-type power users vs single-type drive-bys). Bit
  assignments are hard-coded constants shared by both engines.
- ``weighted_median_price`` — exact quantity-weighted median price per
  return flag: cumulative-weight window, first crossing of half the
  total. The robust location estimate for skewed weighted data; the
  unweighted exact median (D7) can't express it.
- ``haar_energy`` — unnormalized Haar wavelet detail energy at three
  dyadic levels per event-type value series: sums instead of averages
  keep every coefficient integer, so energies are exact int64. High
  level-1 energy = jittery series, high level-3 = slow swings — the
  multi-resolution variance decomposition used for periodicity and
  anomaly triage.
- ``layout_advisor`` — per-table physical stats from one scan each:
  exact payload bytes (8 B per numeric/timestamp + byte length of
  strings), recommended 128 MB-target partition count, and the join-key
  skew ratio (max key frequency vs perfectly-uniform share, scaled).
  The planner-adjacent "how should this table be laid out at 100 TB"
  report, companion to round-11's join_size_report.

Reference parity: none (intel-ai/timedf has no profiling/advisor
surface; D7 covers only the unweighted median).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# engagement_upset

_TYPE_BITS = {"click": 1, "view": 2, "purchase": 4, "signup": 8, "error": 16}


def engagement_upset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    bit = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(b)) for t, b in _TYPE_BITS.items()]
    ).cast("long")
    # bit_or folds duplicates map-side — no distinct pre-pass exchange;
    # n_types is the popcount of the mask, spelled arithmetically so
    # both engines compute the identical integers.
    per_user = (
        ev.select("user_id", bit.alias("_bit"))
        .groupBy("user_id")
        .agg(F.bit_or("_bit").alias("mask"))
    )
    popcnt = sum(
        F.when(F.col("mask").bitwiseAND(F.lit(b)) > 0, 1).otherwise(0)
        for b in _TYPE_BITS.values()
    ).cast("long")
    return (
        per_user.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn("n_types", popcnt)
        .select("mask", "n_users", "n_types")
        .orderBy(F.desc("n_users"), "mask")
    )


def _upset_oracle() -> str:
    case = "CASE event_type " + " ".join(
        f"WHEN '{t}' THEN {b}" for t, b in _TYPE_BITS.items()
    ) + " END"
    pop = " + ".join(
        f"(CASE WHEN mask & {b} > 0 THEN 1 ELSE 0 END)" for b in _TYPE_BITS.values()
    )
    return f"""
WITH per_user AS (
  SELECT user_id, cast(bit_or({case}) AS BIGINT) AS mask
  FROM events GROUP BY user_id
)
SELECT mask, count(*) AS n_users, cast({pop} AS BIGINT) AS n_types
FROM per_user GROUP BY mask ORDER BY n_users DESC, mask
"""

# --------------------------------------------------------------------
# weighted_median_price


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smallest price p per flag with cumweight(p) >= total/2, i.e.
    2*cum >= W in integers (quantity is integral).

    r12 (VERDICT r11 item 6): two-pass bracketing replaces the single
    fact-grain window — the flag key has only 3 values, so the old shape
    sorted the whole table on 3 tasks (the §2.5 straggler at scale).
    Now: (1) pre-aggregate weights to (flag, price) grain — a parallel
    hash aggregate; (2) bucket prices by a fixed integer width, find the
    bucket where the cumulative weight crosses total/2 (a window over
    ~hundreds of bucket rows) and carry the crossing offset; (3) run the
    exact cumulative window ONLY inside that bracket bucket, offset by
    the weight before it. Equivalent by construction: cum(p) over the
    (flag, price) aggregate equals the row-grain cum at each price
    group's end, the crossing price lies in the bracket bucket (cum is
    monotone and the previous buckets are strictly below total/2), and
    prices after the bracket only qualify with larger values — min() is
    unchanged. The truncating CAST bucket key is monotone in price, so
    bucket order == price order."""
    # isNotNull on the shared base: the bracket equi-join below infers
    # isnotnull(flag, price) into ITS copy of the pre-aggregate subtree;
    # mirroring the filter on the bucket-scan branch makes the two
    # subtrees canonically identical so AQE exchange reuse shares the
    # (flag, price) shuffle (without it the exchange is written twice —
    # caught by the shuffle gate, 6.1 -> 14.5 MB). Behavior-identical:
    # the inner bracket join already drops NULL-key groups, and
    # lineitem's flag/price are NOT NULL by TPC-H schema.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", F.col("l_quantity").cast("long").alias("_q")
    ).where(
        F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    # pass 0: (flag, price)-grain weights — the only fact-grain shuffle,
    # hash-partitioned and parallel (no global/keyed sort anywhere)
    pp = (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("_q").alias("_w"))
        .withColumn("_b", F.expr("CAST(l_extendedprice AS BIGINT) DIV 1024"))
        # explicit on BOTH consumers for the same canonicalization reason
        # (the join infers isnotnull on the derived bucket key); no-op
        # rows-wise: _b is null only for null price, already filtered
        .where(F.col("_b").isNotNull())
    )
    # pass 1: bucket totals + crossing bucket per flag (tiny frames)
    pb = pp.groupBy("l_returnflag", "_b").agg(F.sum("_w").alias("_bw"))
    wb = Window.partitionBy("l_returnflag").orderBy("_b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("l_returnflag")
    sel = (
        pb.withColumn("_cumb", F.sum("_bw").over(wb))
        .withColumn("_tot", F.sum("_bw").over(wall))
        .where(F.expr("2 * _cumb >= _tot"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("l_returnflag").orderBy("_b")
            ),
        )
        .where(F.col("_rk") == 1)
        .select(
            "l_returnflag",
            "_b",
            (F.col("_cumb") - F.col("_bw")).alias("_off"),
            "_tot",
        )
    )
    # pass 2: exact crossing inside the bracket bucket only
    wf = Window.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        pp.join(F.broadcast(sel), ["l_returnflag", "_b"])
        .withColumn("_cum", F.sum("_w").over(wf) + F.col("_off"))
        .where(F.expr("2 * _cum >= _tot"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("wmedian_price"))
        .orderBy("l_returnflag")
    )


_WMEDIAN_ORACLE = """
WITH s AS (
  SELECT l_returnflag, l_extendedprice,
         sum(cast(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cast(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, min(l_extendedprice) AS wmedian_price
FROM s WHERE 2 * cum >= tot
GROUP BY l_returnflag ORDER BY l_returnflag
"""

# --------------------------------------------------------------------
# haar_energy

_HAAR_LEVELS = 3


def haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three dyadic levels of unnormalized Haar detail energy per
    event-type series (ordered by ts, event_id; incomplete tail pairs
    dropped at each level, same rule both engines). Level k is one
    pair-grain aggregate over the level k-1 sums — log-depth, each a
    keyed shuffle of a frame that HALVES per level."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    seq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cur = ev.select(
        "event_type",
        (F.row_number().over(seq) - 1).alias("_i"),
        F.floor("value").cast("long").alias("_x"),
    )
    energies = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        paired = cur.groupBy(
            "event_type", F.expr("_i DIV 2").alias("_j")
        ).agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum("_x").alias("_s"),
            F.sum(F.expr("CASE WHEN _i % 2 = 0 THEN _x ELSE -_x END")).alias("_d"),
        ).where(F.col("_c") == 2)
        energies.append(
            paired.groupBy("event_type").agg(
                F.sum(F.expr("_d * _d")).alias(f"energy{lvl}")
            )
        )
        cur = paired.select("event_type", F.col("_j").alias("_i"), F.col("_s").alias("_x"))
    out = energies[0]
    for e in energies[1:]:
        out = out.join(e, "event_type")
    return out.orderBy("event_type")


def _haar_oracle() -> str:
    parts = [
        """l0 AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i,
         cast(floor(value) AS BIGINT) AS x
  FROM events
)"""
    ]
    for lvl in range(1, _HAAR_LEVELS + 1):
        prev, cur = f"l{lvl - 1}", f"l{lvl}"
        parts.append(
            f"""{cur} AS (
  SELECT event_type, j AS i, x, d FROM (
    SELECT event_type, i // 2 AS j,
           cast(sum(x) AS BIGINT) AS x,
           cast(sum(CASE WHEN i % 2 = 0 THEN x ELSE -x END) AS BIGINT) AS d,
           count(*) AS c
    FROM {prev} GROUP BY event_type, i // 2
  ) WHERE c = 2
)"""
        )
        parts.append(
            f"e{lvl} AS (SELECT event_type, cast(sum(d * d) AS BIGINT) "
            f"AS energy{lvl} FROM l{lvl} GROUP BY event_type)"
        )
    joins = " ".join(
        f"JOIN e{lvl} USING (event_type)" for lvl in range(2, _HAAR_LEVELS + 1)
    )
    cols = ", ".join(f"energy{lvl}" for lvl in range(1, _HAAR_LEVELS + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT event_type, {cols} FROM e1 {joins} ORDER BY event_type"
    )

# --------------------------------------------------------------------
# layout_advisor

_TARGET_PART_BYTES = 128 * 1024 * 1024
# (table, string columns, numeric/timestamp column count, join key)
_LAYOUT_TABLES = [
    ("lineitem", ["l_returnflag", "l_linestatus"], 9, "l_orderkey"),
    ("orders", ["o_orderstatus", "o_orderpriority"], 4, "o_custkey"),
    ("events", ["event_type", "props"], 4, "user_id"),
    ("documents", ["text", "lang", "source"], 2, "source"),
]


def layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact payload bytes + partition-count recommendation + join-key
    skew, one scan per table. skew_x1000 = max key frequency / uniform
    share, scaled: 1000 = perfectly uniform, >>1000 = salting needed."""
    out = None
    for table, str_cols, n_num, key in _LAYOUT_TABLES:
        t = load_table(spark, sf_dir, table)
        row_bytes = F.lit(8 * n_num).cast("long")
        for c in str_cols:
            row_bytes = row_bytes + F.coalesce(F.octet_length(c).cast("long"), F.lit(0))
        per_key = t.groupBy(key).agg(
            F.count(F.lit(1)).alias("_kc"), F.sum(row_bytes).alias("_kb")
        )
        agg = per_key.agg(
            F.sum("_kc").alias("n_rows"),
            F.sum("_kb").alias("_bytes"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("_kc").alias("_maxk"),
        )
        row = agg.select(
            F.lit(f"{table}/{key}").alias("table_key"),
            "n_rows",
            F.expr("_bytes DIV 1048576").alias("payload_mb"),
            F.expr(f"(_bytes + {_TARGET_PART_BYTES} - 1) DIV {_TARGET_PART_BYTES}").alias(
                "rec_partitions"
            ),
            "n_keys",
            F.expr("_maxk * n_keys * 1000 DIV n_rows").alias("skew_x1000"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("table_key")


def _layout_oracle() -> str:
    rows = []
    for table, str_cols, n_num, key in _LAYOUT_TABLES:
        rb = " + ".join([f"{8 * n_num}"] + [
            f"coalesce(strlen({c}), 0)" for c in str_cols
        ])
        rows.append(
            f"""SELECT '{table}/{key}' AS table_key,
       cast(sum(kc) AS BIGINT) AS n_rows,
       cast(sum(kb) // 1048576 AS BIGINT) AS payload_mb,
       cast((sum(kb) + {_TARGET_PART_BYTES} - 1) // {_TARGET_PART_BYTES} AS BIGINT) AS rec_partitions,
       count(*) AS n_keys,
       cast(max(kc) * count(*) * 1000 // sum(kc) AS BIGINT) AS skew_x1000
FROM (SELECT {key}, count(*) AS kc, cast(sum({rb}) AS BIGINT) AS kb
      FROM {table} GROUP BY {key})"""
        )
    return " UNION ALL ".join(rows) + " ORDER BY table_key"

# --------------------------------------------------------------------

SUITE = {
    "engagement_upset": QuerySpec(
        "engagement_upset",
        engagement_upset,
        _upset_oracle(),
        "UpSet census of per-user event-type bitmasks, hard-coded bit constants",
    ),
    "weighted_median_price": QuerySpec(
        "weighted_median_price",
        weighted_median_price,
        _WMEDIAN_ORACLE,
        "exact weighted median via cumulative-weight crossing, flag-grain windows",
    ),
    "haar_energy": QuerySpec(
        "haar_energy",
        haar_energy,
        _haar_oracle(),
        "unnormalized Haar detail energy at 3 dyadic levels, integer-exact, frame halves per level",
    ),
    "layout_advisor": QuerySpec(
        "layout_advisor",
        layout_advisor,
        _layout_oracle(),
        "exact payload bytes, 128MB partition recommendation, join-key skew ratio — one scan per table",
    ),
}
