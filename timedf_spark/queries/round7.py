"""Round-7 queries: mergeable distribution summaries — exact equi-depth
histograms and Misra-Gries heavy hitters (operators/summaries.py), each
with a DuckDB oracle and a streaming maintenance twin
(streaming/mg_apply.py; the equi-depth count store rides the exact
rollup store).

Scale posture (the 100 TB lens):

- ``equidepth_prices``: the row scan reduces to per-value counts
  (distributed partial+final aggregate); only the value-grain count
  table (bounded by the caller's quantization — whole currency units
  here) passes through the single-partition cumulative window that
  places bucket boundaries. The same counts are exactly what the
  streaming rollup store maintains, so the histogram of a living table
  is a finisher over the store, not a fact rescan.

- ``mg_token_summary``: token counting is the distributed aggregate;
  the MG reduction reads only the top k+1 counts via TakeOrdered
  (per-partition top-k then a tiny driver merge — no global sort) and a
  1-row broadcast threshold join. The one-shot batch form here is
  oracle-exact; the multi-batch streaming form keeps the
  ``true - est <= n/(k+1)`` undercount bound (pinned in tests).

Reference parity: no histogram or heavy-hitter surface exists in
intel-ai/timedf (SURVEY.md §2 D16/H11 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators import summaries
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_EQUIDEPTH_K = 8
_MG_K = 20

# whole-currency-unit quantization: bounds the distinct-value frame the
# boundary window touches (same expression text on both engines)
_PRICE_EXPR = "cast(floor(o_totalprice) as bigint)"


def equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-bucket equi-depth histogram of order prices."""
    orders = load_table(spark, sf_dir, "orders")
    return summaries.equidepth_histogram(orders, _PRICE_EXPR, _EQUIDEPTH_K)


EQUIDEPTH_ORACLE = summaries.equidepth_sql("orders", _PRICE_EXPR, _EQUIDEPTH_K)


def mg_token_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot Misra-Gries summary (k=20 counters) of the corpus token
    stream — the stopword/boilerplate discovery pass of a curation
    pipeline. est_count = count minus the (k+1)-th largest count."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("item"))
        .filter(F.col("item") != "")
    )
    counts = tokens.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    return summaries.mg_reduce(counts, _MG_K)


MG_TOKENS_ORACLE = summaries.mg_summary_sql(
    _MG_K,
    "SELECT unnest(string_split(text, ' ')) AS token FROM documents",
    item_filter="token <> ''",
)


SUITE = {
    "equidepth_prices": QuerySpec(
        "equidepth_prices",
        equidepth_prices,
        EQUIDEPTH_ORACLE,
        "exact equi-depth price histogram from mergeable per-value counts",
    ),
    "mg_token_summary": QuerySpec(
        "mg_token_summary",
        mg_token_summary,
        MG_TOKENS_ORACLE,
        "Misra-Gries k=20 heavy-hitter token summary (TakeOrdered + threshold, no global sort)",
    ),
}
