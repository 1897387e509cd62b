"""Reference-API parity: the reference's USER-FACING surface is pandas
(workloads are written as pandas code and re-bound to a faster backend —
SURVEY.md §1). Spark ships that same surface as ``pyspark.pandas``, so a
reference user can run their pandas-style workload text unchanged on this
engine. These tests execute the ny_taxi workload shapes in literal pandas
syntax (groupby/size/agg-mean/astype/dt.year/sort_values — the exact
idioms of timedf_benchmarks/ny_taxi/ny_taxi.py:170-270) through
pyspark.pandas and pin them to the engine's native DataFrame queries.

Scale note: pyspark.pandas compiles to the same Catalyst plans (a
groupby-size is the same partial+final hash aggregate); the native
queries stay the benchmarked path because the pandas layer inserts
default_index bookkeeping the DataFrame API doesn't need.
"""

from __future__ import annotations

import pytest

from timedf_spark.queries.taxi import q1, q2, q4

ps = pytest.importorskip("pyspark.pandas")


@pytest.fixture(scope="module", autouse=True)
def _ps_opts():
    ps.set_option("compute.default_index_type", "distributed")
    yield
    ps.reset_option("compute.default_index_type")


def test_q1_groupby_size_matches_native(spark, sf_dir):
    li = ps.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = li.groupby("l_returnflag").size().to_pandas().to_dict()
    want = {r["l_returnflag"]: r["cnt"] for r in q1(spark, sf_dir).collect()}
    assert got == want


def test_q2_groupby_mean_matches_native(spark, sf_dir):
    orders = ps.read_parquet(f"{sf_dir}/orders.parquet")
    got = (
        orders.groupby("o_orderpriority")
        .agg({"o_totalprice": "mean"})["o_totalprice"]
        .to_pandas()
        .to_dict()
    )
    want = {r["o_orderpriority"]: r["avg_total"] for r in q2(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        # native path uses the deterministic quantized mean; pandas mean
        # is plain float — equal to well beyond data precision
        assert abs(got[k] - v) < 1e-9 * max(1.0, abs(v))


def test_q4_astype_year_sort_matches_native(spark, sf_dir):
    li = ps.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(
        l_year=li["l_shipdate"].dt.year.astype("int64"),
        qty_bucket=li["l_quantity"].astype("int64"),  # pandas truncation
    )
    got = (
        li.groupby(["l_returnflag", "l_year", "qty_bucket"])
        .size()
        .reset_index(name="cnt")
        .sort_values(by=["l_year", "cnt"], ascending=[True, False])
    )
    got_set = {
        (r.l_returnflag, r.l_year, r.qty_bucket, r.cnt)
        for r in got.to_pandas().itertuples(index=False)
    }
    want_rows = q4(spark, sf_dir).collect()
    want_set = {
        (r["l_returnflag"], r["l_year"], r["qty_bucket"], r["cnt"])
        for r in want_rows
    }
    assert got_set == want_set
