"""Round-5 regression tests: the four round-4 advisor items (compaction
liveness wedge, zero-pair tier report, persist-mode equality) plus the
off-timed-path persistence refactor."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from timedf_spark.sources.readers import load_table
from timedf_spark.streaming import sinks as streaming_sinks
from timedf_spark.streaming.compaction import compact_sink, read_sink


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_compaction_debris_below_covered(spark, sf_dir, tmp_path):
    """A partially-deleted folded dir BELOW coverage (best-effort cleanup
    crashed after removing _SUCCESS) must not wedge future compactions —
    the advisor's liveness finding: pre-fix, the ceiling pinned at the
    debris id <= covered and every compact_sink returned compacted=False
    forever."""
    path = str(tmp_path / "sink")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(300)
    )
    batches = [ev.filter((F.col("event_id") % 7) == i) for i in range(7)]
    for i in range(5):
        streaming_sinks.write_batch_idempotent(batches[i], i, path)
    stats = compact_sink(spark, path)  # folds 0..3, leaves max live (4)
    assert stats["compacted"] and stats["covered"] == 3

    # simulate cleanup debris: an already-folded dir id=2 reappears with a
    # stray data file and NO _SUCCESS (rmtree removed the marker, crashed)
    debris = os.path.join(path, "batch_id=2")
    os.makedirs(debris, exist_ok=True)
    with open(os.path.join(debris, "part-stray.parquet"), "wb") as f:
        f.write(b"not a real parquet file")

    for i in (5, 6):
        streaming_sinks.write_batch_idempotent(batches[i], i, path)
    stats2 = compact_sink(spark, path)
    assert stats2["compacted"], "debris below covered wedged the compactor"
    assert stats2["covered"] == 5  # folded 4,5; max live (6) left alone

    # reader view: all 7 committed batches, debris invisible
    assert _rows(read_sink(spark, path).drop("batch_id")) == _rows(ev)


def test_prefix_pairs_persist_modes_identical(spark, sf_dir):
    """persist_mode is an execution knob, never a semantics knob: cache
    (query-path default, harness owns cleanup) and checkpoint (long-lived
    session) must return identical pair sets."""
    from timedf_spark.operators import dedup

    cached = dedup.ngram_jaccard_prefix_pairs(spark, sf_dir, persist_mode="cache")
    ckpt = dedup.ngram_jaccard_prefix_pairs(spark, sf_dir, persist_mode="checkpoint")
    assert _rows(cached) == _rows(ckpt)
    spark.catalog.clearCache()


def test_tier_report_zero_pair_corpus_yields_null(spark, tmp_path):
    """On a corpus with no near-dup pairs, recall/precision must be NULL
    (nullif guard) rather than a crash or an engine-dependent x/0."""
    import duckdb

    from timedf_spark.queries.round6 import _tier_report_oracle, near_dup_tier_report

    sf = str(tmp_path / "mini")
    os.makedirs(sf, exist_ok=True)
    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out = near_dup_tier_report(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 0 and r["n_lsh"] == 0 and r["n_common"] == 0
    assert r["recall"] is None and r["precision"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orc = con.execute(_tier_report_oracle()).fetchall()
    assert orc[0][:3] == (0, 0, 0)
    assert orc[0][3] is None and orc[0][4] is None


def test_charlm_release_is_callers_choice(spark, sf_dir):
    """release=True and release=False score identically; the query wrapper
    defaults to False (harness owns cache hygiene — the r04 3.5x lesson)."""
    from timedf_spark.operators import lm

    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    )
    kept = _rows(lm.charlm_doc_scores(docs, release=False))
    spark.catalog.clearCache()
    released = _rows(lm.charlm_doc_scores(docs, release=True))
    assert kept == released
    spark.catalog.clearCache()
