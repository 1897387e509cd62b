"""Round-9 regression tests: the round-8 advisor items + the fan_out
default flip (VERDICT r08 item 1).

1. (low) session conf: SPARK_GRAFT_CHECKPOINT_DIR present must turn on
   spark.cleaner.referenceTracking.cleanCheckpoints so reliable
   checkpoints from ANY entry point are garbage-collected, not only
   tools/scale_shakeout.py runs.
2. (low) _checkpoint with a checkpoint dir already set to a DIFFERENT
   directory than SPARK_GRAFT_CHECKPOINT_DIR must warn and re-point
   instead of silently writing into the stale directory.
3. (low) blocking_profile: NULL lang / NULL n_chars rows must land in
   the SAME block on both engines (concat_ws skips NULL operands,
   || propagates them — both sides now coalesce explicitly).
4. fan_out's min_bytes floor is opt-in again (default 0): the r08
   24 MB default silently disabled fan-out for every sub-24MB scan and
   regressed seven per-row-CPU queries at sf0.1.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_session_conf_gains_checkpoint_cleaner(monkeypatch):
    """With SPARK_GRAFT_CHECKPOINT_DIR set, every profile's resolved conf
    enables ContextCleaner checkpoint GC; without it, the knob is absent
    (localCheckpoint path — nothing to clean)."""
    from timedf_spark.session import PROFILES, _resolve_conf

    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    for profile in PROFILES:
        assert (
            "spark.cleaner.referenceTracking.cleanCheckpoints"
            not in _resolve_conf(profile)
        )
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/ckpt_test")
    for profile in PROFILES:
        conf = _resolve_conf(profile)
        assert conf["spark.cleaner.referenceTracking.cleanCheckpoints"] == "true"
    # an explicit caller override is never clobbered
    conf = _resolve_conf(
        "local",
        {"spark.cleaner.referenceTracking.cleanCheckpoints": "false"},
    )
    assert conf["spark.cleaner.referenceTracking.cleanCheckpoints"] == "false"


def test_checkpoint_dir_mismatch_warns_and_repoints(spark, tmp_path, monkeypatch):
    """First _checkpoint call pins dir A; changing the env to dir B must
    WARN and re-point (pre-fix: silently kept A for the whole session)."""
    from timedf_spark.operators.cluster import _checkpoint

    dir_a = str(tmp_path / "ckpt_a")
    dir_b = str(tmp_path / "ckpt_b")
    df = spark.range(10)

    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", dir_a)
    out, ids = _checkpoint(df)
    assert out.count() == 10 and ids == set()
    cur = str(spark.sparkContext._jsc.sc().getCheckpointDir().get())
    assert os.path.basename(os.path.dirname(cur.rstrip("/"))) == "ckpt_a"

    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", dir_b)
    with pytest.warns(UserWarning, match="re-pointing"):
        out, _ = _checkpoint(df)
    assert out.count() == 10
    cur = str(spark.sparkContext._jsc.sc().getCheckpointDir().get())
    assert os.path.basename(os.path.dirname(cur.rstrip("/"))) == "ckpt_b"
    assert os.path.isdir(dir_b)

    # same env value again: no warning, dir stays
    import warnings

    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        _checkpoint(df)
    assert not [w for w in record if issubclass(w.category, UserWarning)]


def test_blocking_profile_null_key_semantics(spark, tmp_path):
    """A documents table with NULL lang / NULL n_chars must produce the
    IDENTICAL blocking profile on both engines — pre-fix, concat_ws
    dropped the NULL operand on the Spark side ('en|') while the oracle's
    || yielded a NULL key, splitting the row across different blocks."""
    import duckdb
    import pandas as pd

    from tests.oracle_compare import compare
    from timedf_spark.queries import all_queries

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["alpha beta", "gamma", "delta eps", "zeta", "eta theta"],
            "lang": ["en", None, "en", None, "fr"],
            "n_chars": pd.array([10, 5, None, 4, 9], dtype="Int64"),
            "source": ["s1"] * 5,
        }
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path, index=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    spec = all_queries()["blocking_profile"]
    issues = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    con.close()
    assert issues == [], issues


def test_fan_out_floor_is_opt_in(spark, sf_dir):
    """Default fan_out must widen an under-split scan regardless of its
    size (the r08 24 MB default regressed seven per-row-CPU queries);
    the floor only gates when passed explicitly."""
    from timedf_spark.sources import fan_out, load_table

    docs = load_table(spark, sf_dir, "documents")  # sub-MB at test SFs
    widened = fan_out(docs)
    assert (
        widened.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    assert fan_out(docs, min_bytes=24 << 20) is docs


def test_shuffle_waiver_self_heals_below_ceiling(monkeypatch, tmp_path, capsys):
    """bench shuffle gate (VERDICT r08 item 3): an intentional plan change
    listed in SHUFFLE_WAIVERS reports under shuffle_waived and re-pins its
    baseline — but only BELOW the waiver ceiling; above it, it is a real
    regression. Unlisted queries regress exactly as before."""
    import json

    import bench

    pin = {
        "sf": 0.1,
        "queries": {"waived_q": 1.0, "plain_q": 1.0, "over_q": 1.0},
        "shuffle_baseline_mb": {"waived_q": 1.0, "plain_q": 1.0, "over_q": 1.0},
    }
    monkeypatch.setattr(bench, "_read_pin", lambda: pin)
    monkeypatch.setattr(
        bench, "_pin_path", lambda tag=None: str(tmp_path / "pin.json")
    )
    monkeypatch.setattr(
        bench,
        "SHUFFLE_WAIVERS",
        {"waived_q": (10.0, "test plan change"), "over_q": (4.0, "capped")},
    )
    bench._report(
        per_query={"waived_q": 1.0, "plain_q": 1.0, "over_q": 1.0},
        shuffle_mb={"waived_q": 5.0, "plain_q": 5.0, "over_q": 5.0},
        scan_baseline=1.0,
        evidence={},
        sf=0.1,
        write_local=True,
    )
    detail = json.loads(capsys.readouterr().out.splitlines()[0])
    assert list(detail["shuffle_waived"]) == ["waived_q"]
    assert detail["shuffle_waived"]["waived_q"]["reason"] == "test plan change"
    assert set(detail["shuffle_regressions"]) == {"plain_q", "over_q"}
    # waived baseline self-healed; regressed baselines kept
    assert detail["shuffle_baseline_mb"] == {
        "waived_q": 5.0, "plain_q": 1.0, "over_q": 1.0
    }


def test_cc_impl_routing_both_paths_identical_fixpoint(spark, monkeypatch):
    """VERDICT r08 item 2: the DISTRIBUTED connected-components path
    defaults to the large/small-star rewrite (A/B at forced-distributed
    100x: star t100 114.6 s / exp 0.69 vs pointer jumping 205.0 s /
    0.87) with SPARK_GRAFT_CC_IMPL=jump restoring pointer jumping. Both
    must land on the identical min-id fixpoint — including singleton
    vertices and a self-loop."""
    from timedf_spark.operators.cluster import connected_components

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_DRIVER_PATH", "0")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (3, 9)], "src long, dst long"
    )
    vertices = spark.range(1, 11).selectExpr("id AS v")
    monkeypatch.delenv("SPARK_GRAFT_CC_IMPL", raising=False)
    star = sorted(map(tuple, connected_components(vertices, edges).collect()))
    monkeypatch.setenv("SPARK_GRAFT_CC_IMPL", "jump")
    jump = sorted(map(tuple, connected_components(vertices, edges).collect()))
    assert jump == star
    assert dict(star)[9] == 1 and dict(star)[10] == 10


def test_jaccard_minhash_entry_points_keep_floor(spark, sf_dir):
    """The two dedup entry points whose r08 A/B measured fan-out LOSING
    keep the explicit 24 MB floor: at test SFs their scans must NOT grow
    a round-robin exchange (RoundRobinPartitioning in the plan)."""
    from timedf_spark.operators import dedup

    for fn in (dedup.ngram_jaccard_pairs, dedup.minhash_lsh_pairs):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "roundrobin" not in plan.lower(), fn.__name__
