"""Broadcast Bloom filter + incremental corpus-ingest dedup.

The 100 TB problem this solves: every day a (comparatively small) batch of
new documents must be deduplicated against an existing multi-TB corpus. A
plain anti-join shuffles BOTH sides on the content hash — at corpus scale
that is a full-corpus shuffle per ingest. The Bloom route never shuffles a
single corpus row:

1. build   — one corpus scan folds per-task Bloom bitmaps (Arrow-batched
             numpy, ``mapInPandas``), OR-combined through a two-level tree
             (task bitmaps → ``fanin`` group bitmaps → driver). Combine
             traffic is ``(tasks + fanin) × m/8`` bytes of bitmaps, not
             rows, and the OR-tree depth is constant.
2. probe   — the bitmap is broadcast; a vectorized pandas UDF tests the
             batch's content hashes. Misses are *certainly* new (Bloom has
             no false negatives) and skip straight to the output.
3. confirm — only the (fpp-small) set of possible hits re-touches the
             corpus: a second scan with the candidate hash set broadcast,
             ``left_semi`` — a broadcast hash join, so again zero corpus
             shuffle. This removes the false positives, making the END
             RESULT EXACT — the Bloom tier only routes work, it never
             decides membership alone. The operator is therefore
             oracle-checkable as a plain NOT EXISTS anti-join.

Sizing: with ``m`` bits and ``k`` hashes over ``n`` corpus keys, fpp ≈
(1 − e^{−kn/m})^k; the defaults (m=2^22, k=5) hold fpp < 1% to ~400k keys.
At 10^9 corpus docs, m=2^33 (1 GiB bitmap) keeps the same regime — still a
broadcast-able object, and the confirm pass bounds the cost of any fpp
misjudgement. Bit positions use double hashing (Kirsch-Mitzenmacher) from
two xxhash64 values, so build and probe agree bit-for-bit by construction.

Content identity is ``md5(text)`` — the same engine-independent key the
exact-dedup tier and the streaming dedup use, so the DuckDB oracle can
express the whole operator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = ["build_bloom", "with_might_contain", "incremental_dedup"]

_DEF_M_BITS = 1 << 22  # 4 Mi bits = 512 KiB bitmap
_DEF_K = 5
_FANIN = 32  # width of the intermediate OR level


def _positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """k double-hashed bit positions per row; m_bits must be a power of two."""
    mask = np.uint64(m_bits - 1)
    u1, u2 = h1.astype(np.uint64), h2.astype(np.uint64)
    for i in range(k):
        yield (u1 + np.uint64(i) * u2) & mask


def _hash_cols(col: str) -> list:
    # two independent 64-bit lanes for double hashing; the seed column makes
    # the second lane a different function of the same key
    return [
        F.xxhash64(F.col(col)).alias("__h1"),
        F.xxhash64(F.col(col), F.lit(1)).alias("__h2"),
    ]


def build_bloom(df: DataFrame, col: str, m_bits: int = _DEF_M_BITS, k: int = _DEF_K) -> np.ndarray:
    """Fold ``df[col]`` into one Bloom bitmap (uint64 word array).

    One pass over the data; per-task bitmaps are OR-merged through a
    ``_FANIN``-way intermediate aggregation so the driver never receives
    more than ``_FANIN`` bitmaps regardless of task count.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    n_words = m_bits // 64
    hashed = df.select(*_hash_cols(col))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for b in batches:
            seen = True
            for pos in _positions(b["__h1"].to_numpy(), b["__h2"].to_numpy(), m_bits, k):
                np.bitwise_or.at(bm, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    task_maps = hashed.mapInPandas(fold, "bitmap binary")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(n_words, dtype=np.uint64)
        for raw in pdf["bitmap"]:
            bm |= np.frombuffer(raw, dtype=np.uint64)
        return pd.DataFrame({"bitmap": [bm.tobytes()]})

    group_maps = (
        task_maps.withColumn("gid", F.pmod(F.monotonically_increasing_id(), F.lit(_FANIN)))
        .groupBy("gid")
        .applyInPandas(merge, "bitmap binary")
        .collect()
    )
    out = np.zeros(n_words, dtype=np.uint64)
    for row in group_maps:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    return out


def with_might_contain(
    df: DataFrame, col: str, bitmap: np.ndarray, k: int = _DEF_K, out_col: str = "might_contain"
) -> DataFrame:
    """Add a boolean Bloom-membership column (vectorized probe, no shuffle)."""
    m_bits = int(bitmap.size * 64)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = bc.value
        hit = np.ones(len(h1), dtype=bool)
        for pos in _positions(h1.to_numpy(), h2.to_numpy(), m_bits, k):
            word = bm[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(hit)

    hashed = df.select("*", *_hash_cols(col))
    return hashed.withColumn(out_col, probe(F.col("__h1"), F.col("__h2"))).drop("__h1", "__h2")


def incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = _DEF_M_BITS,
    k: int = _DEF_K,
) -> DataFrame:
    """EXACT incremental dedup of ``new_df`` against ``corpus_df``.

    Returns the new rows that survive: first-per-content-hash within the
    batch (keeper = min id), minus anything whose hash already exists in
    the corpus. Equivalent to a NOT EXISTS anti-join — the Bloom filter
    only decides which (few) hashes need the corpus confirm pass, so the
    corpus is scanned twice but shuffled ZERO times; the only shuffled rows
    are the batch itself (for the in-batch keeper window).
    """
    hashed = new_df.withColumn("content_hash", F.expr(f"md5({text_col})"))
    # in-batch keeper: min-by-id per hash as ONE aggregate — min over a
    # struct with the id leading is lexicographic, so the whole keeper row
    # rides along. One batch-sized shuffle with map-side combine; no
    # self-join, no window sort.
    row_cols = [c for c in new_df.columns if c != id_col]
    batch = (
        hashed.groupBy("content_hash")
        .agg(F.min(F.struct(id_col, *row_cols)).alias("__keep"))
        .select("content_hash", "__keep.*")
    )

    bloom = build_bloom(corpus_df.select(F.expr(f"md5({text_col})").alias("h")), "h", m_bits, k)
    flagged = with_might_contain(batch, "content_hash", bloom, k).cache()

    certain_new = flagged.filter(~F.col("might_contain")).drop("might_contain")
    candidates = flagged.filter(F.col("might_contain")).drop("might_contain")

    # confirm pass: candidate hash set is broadcast; corpus side is a
    # broadcast-hash left-semi — scan + probe, no corpus shuffle
    cand_hashes = F.broadcast(candidates.select("content_hash").distinct())
    confirmed_dups = (
        corpus_df.select(F.expr(f"md5({text_col})").alias("content_hash"))
        .join(cand_hashes, "content_hash", "left_semi")
        .distinct()
    )
    survivors = candidates.join(F.broadcast(confirmed_dups), "content_hash", "left_anti")
    return certain_new.unionByName(survivors)
