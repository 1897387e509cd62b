"""Round-23 queries: output-volume guards and round-7 additions.

Reference parity: extension layer (intel-ai/timedf has no interval-join
surface); ``overlapping_sessions_capped`` is the degree-cap analog for
the one remaining super-linear shakeout row (VERDICT r06 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.queries.round5 import OVERLAPPING_SESSIONS_ORACLE

_OVERLAP_CAP = 8


def _overlapping_sessions_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``overlapping_sessions`` with a per-session emission cap — the
    degree-cap analog (semantic-dedup precedent, VERDICT r06 item 5)
    for the one output-volume-driven super-linear shakeout row: the
    uncapped query's TRUE pair count grows ~quadratically with
    concurrency (98.7x pairs at 10x events), so any exact operator is
    output-bound there. Concurrency ANALYSIS rarely needs every pair;
    it needs each session's strongest overlaps. Keeping the top
    ``_OVERLAP_CAP`` partners per (user_a, session_a) by
    (overlap_us DESC, user_b, session_b) makes the output linear in
    session count while candidate generation stays the grid-bucketed
    interval join (never all-pairs). Fully deterministic ordering →
    oracle-exact."""
    from timedf_spark.operators.intervals import interval_overlap_topk
    from timedf_spark.operators.sessionize import sessionize

    sess = sessionize(spark, sf_dir).select(
        "user_id",
        "session_id",
        F.unix_micros("t_start").alias("start_us"),
        F.unix_micros("t_end").alias("end_us"),
    )
    return interval_overlap_topk(
        sess,
        sess,
        key_cols=["a_user_id", "a_session_id"],
        k=_OVERLAP_CAP,
        pair_filter="a_user_id < b_user_id",
        order_cols=["b_user_id", "b_session_id"],
    ).select(
        F.col("a_user_id").alias("user_a"),
        F.col("a_session_id").alias("session_a"),
        F.col("b_user_id").alias("user_b"),
        F.col("b_session_id").alias("session_b"),
        "overlap_us",
        "overlap_rank",
    )


_OVERLAP_CAPPED_ORACLE = f"""
WITH pairs AS ({OVERLAPPING_SESSIONS_ORACLE.strip()})
SELECT user_a, session_a, user_b, session_b, overlap_us,
       cast(overlap_rank AS BIGINT) AS overlap_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_a, session_a
    ORDER BY overlap_us DESC, user_b, session_b
  ) AS overlap_rank
  FROM pairs
)
WHERE overlap_rank <= {_OVERLAP_CAP}
"""


SUITE: dict[str, QuerySpec] = {
    "overlapping_sessions_capped": QuerySpec(
        "overlapping_sessions_capped",
        _overlapping_sessions_capped,
        _OVERLAP_CAPPED_ORACLE,
        "top-8 overlap partners per session: linear output, grid-bucketed candidates",
    ),
}
