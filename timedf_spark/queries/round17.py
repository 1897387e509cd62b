"""Round-17 queries: readability scoring.

``readability_by_source`` — per-source mean Flesch reading-ease,
computed entirely in integers. For each document: W = word count,
S = sentence count (terminal-punctuation runs, min 1), Syl = syllable
estimate (vowel groups per word, the standard heuristic). Flesch
= 206.835 − 1.015·W/S − 84.6·Syl/W; multiplying through by 1000·S·W
gives the exact integer form

    F1000 = (206835·S·W − 1015·W² − 84600·Syl·S) DIV (S·W)

so the per-document score and the per-source mean (sum DIV count) are
bit-identical across engines — no float division anywhere. The
readability band is a classic text-quality curation signal next to
the stopword/length ratios in ``operators/text.py``.

Counting primitives are chosen for cross-engine determinism: word
count from space-split size, sentence count and vowel groups via
regexp_replace-to-marker then length arithmetic on ASCII classes
(identical regex semantics in Spark and DuckDB for these patterns —
pinned by the differential oracle at two scale factors and a Python
recomputation test).

Reference parity: none (intel-ai/timedf has no text surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# syllables ~ vowel groups; count by replacing each run with one marker
# and diffing lengths. Sentences: runs of [.!?] (min 1 per doc).
_SYL_SPARK = (
    "length(regexp_replace(lower(text), '[aeiouy]+', '#')) "
    "- length(regexp_replace(lower(text), '[aeiouy]+', ''))"
)
_SENT_SPARK = (
    "greatest(length(regexp_replace(text, '[.!?]+', '#')) "
    "- length(regexp_replace(text, '[.!?]+', '')), 1)"
)


def readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    scored = docs.select(
        "source",
        F.expr("size(split(text, ' '))").cast("long").alias("_w"),
        F.expr(_SENT_SPARK).cast("long").alias("_s"),
        F.expr(_SYL_SPARK).cast("long").alias("_syl"),
    ).where(F.col("_w") > 0)
    f1000 = F.expr(
        "(206835 * _s * _w - 1015 * _w * _w - 84600 * _syl * _s) DIV (_s * _w)"
    )
    return (
        scored.withColumn("_f", f1000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(_f) DIV count(1)").alias("flesch_x1000"),
            F.expr("sum(_syl) * 1000 DIV sum(_w)").alias("syl_per_word_x1000"),
        )
        .orderBy("source")
    )


_READABILITY_ORACLE = """
WITH scored AS (
  SELECT source,
         cast(len(string_split(text, ' ')) AS BIGINT) AS w,
         cast(greatest(length(regexp_replace(text, '[.!?]+', '#', 'g'))
              - length(regexp_replace(text, '[.!?]+', '', 'g')), 1) AS BIGINT) AS s,
         cast(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
              - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT) AS syl
  FROM documents
), f AS (
  SELECT source, w, syl,
         (206835 * s * w - 1015 * w * w - 84600 * syl * s) // (s * w) AS f1000
  FROM scored WHERE w > 0
)
SELECT source, count(*) AS n_docs,
       cast(sum(f1000) // count(*) AS BIGINT) AS flesch_x1000,
       cast(sum(syl) * 1000 // sum(w) AS BIGINT) AS syl_per_word_x1000
FROM f GROUP BY source ORDER BY source
"""

SUITE = {
    "readability_by_source": QuerySpec(
        "readability_by_source",
        readability_by_source,
        _READABILITY_ORACLE,
        "integer-exact Flesch reading ease (multiplied through by S*W); per-source mean",
    ),
}
