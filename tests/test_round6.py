"""Round-6 semantics: Markov transitions, exact incremental rollup
maintenance, curation funnel consistency, streaming rolling-distinct.
(The DuckDB equality oracles run in test_queries_oracle.py; these pin
the semantic invariants the oracles can't express.)"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources import load_table


def test_markov_rows_are_probability_distributions(spark, sf_dir):
    """Per from_type the outgoing probabilities must sum to 1 (each row
    count divided by the same exact integer total)."""
    df = all_queries()["markov_transitions"].fn(spark, sf_dir)
    sums = df.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert sums, "no transitions found"
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9, (r["from_type"], r["s"])


def test_markov_transitions_stay_within_sessions(spark):
    """A gap larger than the session timeout must NOT produce a
    transition: two events 2h apart for one user are separate sessions."""
    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (1, 2, "2024-01-01 10:05:00", "click"),   # view -> click (same session)
        (1, 3, "2024-01-01 13:00:00", "purchase"),  # new session: no click -> purchase
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.createOrReplaceTempView("events")
    from timedf_spark.queries.round6 import MARKOV_SQL

    got = {(r["from_type"], r["to_type"]): r["n_transitions"] for r in spark.sql(MARKOV_SQL).collect()}
    assert got == {("view", "click"): 1}


def test_expectations_count_violations_exactly(spark):
    """Each rule kind must count its violations precisely on a frame
    built to violate everything: NULL keys, out-of-range values, foreign
    orphans, duplicate keys, unaccepted values. (The registered query
    covers only the all-green contract on clean testdata.)"""
    from timedf_spark.operators import expect as X

    fact = spark.createDataFrame(
        [
            (1, 10.0, "O", 100),   # clean
            (1, -5.0, "O", 100),   # duplicate key + below range
            (None, 50.0, "X", 100),  # null key + bad status
            (3, None, "F", 999),   # null price (range counts NULL) + orphan fk
        ],
        "k long, price double, status string, cust long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "c long")
    report = X.expectations_report(
        fact,
        [
            X.not_null("k"),
            X.in_range("price", 0, 100),
            X.accepted_values("status", ["O", "F"]),
            X.unique("k"),
            X.foreign_key("cust", "c"),
        ],
        dims={"c": dim},
    )
    got = {r["rule"]: (r["n_violations"], r["ok"]) for r in report.collect()}
    assert got == {
        "not_null(k)": (1, False),
        "in_range(price,0,100)": (2, False),  # -5 and the NULL price
        "accepted_values(status)": (1, False),
        "unique(k)": (1, False),  # 3 non-null key rows, 2 distinct (NULL
        # keys are not uniqueness violations — standard SQL semantics)
        "fk(cust->c)": (1, False),
    }


def test_pit_lookup_semantics(spark):
    """Point-in-time contract on a hand-built timeline: a purchase takes
    the state of the interval CONTAINING it, a purchase before the first
    interval keeps NULL (left join), and the open current interval
    (valid_to NULL) matches everything after its start."""
    rows = [
        (1, 1, "2024-01-01 08:00:00", "purchase", 1.0, "{}"),   # before any state
        (1, 2, "2024-01-01 09:00:00", "view", 1.0, "{}"),
        (1, 3, "2024-01-01 10:00:00", "purchase", 1.0, "{}"),   # during 'view'
        (1, 4, "2024-01-01 11:00:00", "click", 1.0, "{}"),
        (1, 5, "2024-01-01 12:00:00", "purchase", 1.0, "{}"),   # during open 'click'
    ]
    ev = spark.createDataFrame(
        [(u, e, ts, t, v, p) for (u, e, ts, t, v, p) in rows],
        "user_id long, event_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import tempfile as _tf

    from timedf_spark.queries.round6 import purchase_state_lookup

    with _tf.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["event_id"]: r["state"]
            for r in purchase_state_lookup(spark, d).collect()
        }
    assert got == {1: None, 3: "view", 5: "click"}


def test_incremental_rollup_equals_full_recompute_bitwise(spark, sf_dir):
    """The core claim: integer quantized accumulators are associative, so
    base + delta == full recompute EXACTLY (not approximately) — checked
    inside Spark here, independent of the DuckDB oracle."""
    from timedf_spark.queries.round6 import _day_rollup, incremental_daily_rollup

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    full = _day_rollup(orders).select(
        F.col("day"),
        F.col("n_rows").alias("n_orders"),
        F.expr("cast(sum_q as double) / 10000.0").alias("revenue"),
    )
    inc = incremental_daily_rollup(spark, sf_dir)
    full_m = {r["day"]: (r["n_orders"], r["revenue"]) for r in full.collect()}
    inc_m = {r["day"]: (r["n_orders"], r["revenue"]) for r in inc.collect()}
    assert full_m == inc_m  # exact float equality — the whole point


def test_curation_funnel_consistent_with_curate_corpus(spark, sf_dir):
    """Counts must be monotone non-increasing through the stages and the
    final stage must equal curate_corpus's surviving row count."""
    qs = all_queries()
    funnel = {r["stage"]: r["n_docs"] for r in qs["curation_funnel"].fn(spark, sf_dir).collect()}
    assert (
        funnel["raw"]
        >= funnel["quality"]
        >= funnel["exact_dedup"]
        >= funnel["near_dup_keepers"]
    ), funnel
    assert funnel["near_dup_keepers"] == qs["curate_corpus"].fn(spark, sf_dir).count()


def test_streaming_rollup_store_equals_batch_recompute_exactly(spark, sf_dir, tmp_path):
    """Multi-batch replay of orders into the rollup store: the published
    aggregate must equal ONE aggregation of all rows BIT-FOR-BIT (integer
    quantized accumulators are associative — this is the exactness the
    sketch store can't offer), and a redelivered batch id must be a
    no-op (double-merge would double-count)."""
    from timedf_spark.operators.rollup import finish_rollup, quantized_rollup
    from timedf_spark.streaming import rollup_apply as ra
    from timedf_spark.streaming.cdc_apply import _current_version

    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    fact = orders.select(F.col("o_orderdate").alias("day"), "o_totalprice")
    store = str(tmp_path / "rollup_store")
    ra.seed_rollup_store(spark, store, "day timestamp")

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "orders")
        fact.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(fact.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            ra.rollup_sink(
                stream, store, os.path.join(d, "ckpt"),
                ["day"], "day timestamp", "o_totalprice",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got = {
        r["day"]: (r["n_rows"], r["value_sum"])
        for r in finish_rollup(ra.read_rollup(spark, store, "day timestamp")).collect()
    }
    want = {
        r["day"]: (r["n_rows"], r["value_sum"])
        for r in finish_rollup(quantized_rollup(fact, ["day"], "o_totalprice")).collect()
    }
    assert got == want  # exact float equality, day for day

    # redelivery guard: same batch id again must not double-count
    v = _current_version(store)
    ra.apply_rollup_batch(fact.limit(50), v, store, ["day"], "day timestamp", "o_totalprice")
    assert _current_version(store) == v
    after = {
        r["day"]: (r["n_rows"], r["value_sum"])
        for r in finish_rollup(ra.read_rollup(spark, store, "day timestamp")).collect()
    }
    assert after == got


def test_streaming_ingest_dedup_reaches_batch_fixpoint(spark, sf_dir, tmp_path):
    """The full streaming dedup loop: documents replayed in micro-batches
    produce near-dup pairs (batch-internal + batch↔corpus probes) and
    maintain the cluster assignment — the final published assignment must
    equal from-scratch connected components over the LSH pairs of ALL
    documents, and a replayed batch must converge."""
    from timedf_spark.operators import cluster, dedup
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.cdc_apply import _current_version

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    idd.seed_empty_assignments(spark, assign_store)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "docs")
        docs.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            idd.ingest_dedup_sink(
                stream, corpus_store, assign_store, os.path.join(d, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    got = {
        (r["vertex"], r["component"])
        for r in ca.read_assignments(spark, assign_store).collect()
    }
    want = {
        (r["vertex"], r["component"])
        for r in cluster.connected_components(
            docs.select("doc_id"),
            dedup.minhash_lsh_pairs_df(docs).select("doc_a", "doc_b"),
        ).collect()
    }
    assert got == want

    # replay convergence: re-applying the published batch id is a no-op
    v = _current_version(assign_store)
    idd.apply_ingest_batch(docs.limit(7), v, corpus_store, assign_store)
    assert _current_version(assign_store) == v
    assert {
        (r["vertex"], r["component"])
        for r in ca.read_assignments(spark, assign_store).collect()
    } == got


def test_streaming_rolling_distinct_matches_batch(spark, sf_dir, tmp_path):
    """Multi-batch replay of the events table into the day-sketch store:
    the trailing-window estimates must match the batch sketch path within
    HLL merge-order tolerance (2%), and a replayed batch must be a
    convergent no-op."""
    from timedf_spark.functions.sketches import rolling_distinct_estimate
    from timedf_spark.streaming import rolling_distinct as rd

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    store = str(tmp_path / "sketch_store")
    rd.seed_sketch_store(spark, store)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        # several source files -> several micro-batches with maxFilesPerTrigger
        events.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            rd.rolling_distinct_sink(
                stream, store, os.path.join(d, "ckpt"), "ts", "user_id"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got = {r["day"]: r["estimate"] for r in rd.read_rolling_estimates(spark, store, 7).collect()}
    want = {
        r["day"]: r["estimate"]
        for r in rolling_distinct_estimate(events, "ts", "user_id", 7).collect()
    }
    assert set(got) == set(want)
    for day, w in want.items():
        assert abs(got[day] - w) <= max(1.0, 0.02 * w), (day, got[day], w)

    # replay convergence: re-applying an already-published batch id is a no-op
    from timedf_spark.streaming.cdc_apply import _current_version

    v = _current_version(store)
    rd.apply_sketch_batch(events.limit(10), v, store, "ts", "user_id")
    assert _current_version(store) == v
    after = {r["day"]: r["estimate"] for r in rd.read_rolling_estimates(spark, store, 7).collect()}
    assert after == got
