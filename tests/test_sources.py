"""Sources coverage (SURVEY.md §2.A): explicit-schema CSV scans (A1), gzip,
multi-file union ingest (A4), synthetic source (A12), and as-of join
semantics (operators/asof.py) against a pandas merge_asof reference."""

from __future__ import annotations

import glob
import gzip
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timedf_spark.operators.asof import asof_join
from timedf_spark.sources import load_table, read_csv, union_ingest
from timedf_spark.sources.readers import synthetic_frame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)


@pytest.fixture(scope="module")
def csv_dir(spark, sf_dir, tmp_path_factory):
    """orders exported to headerless CSV (2 plain files + 1 gzip), the
    reference's ingest format (benchmark_utils.py:25-46)."""
    d = tmp_path_factory.mktemp("csv")
    pdf = load_table(spark, sf_dir, "orders").toPandas()
    third = len(pdf) // 3
    pdf.iloc[:third].to_csv(d / "part1.csv", index=False, header=False)
    pdf.iloc[third : 2 * third].to_csv(d / "part2.csv", index=False, header=False)
    with gzip.open(d / "part3.csv.gz", "wt") as f:
        pdf.iloc[2 * third :].to_csv(f, index=False, header=False)
    return str(d)


def test_csv_multi_file_scan_roundtrip(spark, sf_dir, csv_dir):
    """A1+A4: one multi-path scan over plain+gzip files == the parquet table."""
    paths = sorted(glob.glob(os.path.join(csv_dir, "*")))
    df = read_csv(spark, paths, _SCHEMA)
    orig = load_table(spark, sf_dir, "orders")
    assert df.count() == orig.count()
    a = df.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).first()
    b = orig.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).first()
    assert a[0] == b[0]
    assert a[1] == pytest.approx(b[1], rel=1e-12)
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"


def test_union_ingest_heterogeneous(spark, sf_dir, csv_dir):
    """A4 heterogeneous path: per-file frames with a missing column union
    by name with NULL fill (ny_taxi_ml per-year schemas)."""
    paths = sorted(glob.glob(os.path.join(csv_dir, "*.csv")))
    df1 = read_csv(spark, paths[0], _SCHEMA)
    df2 = read_csv(spark, paths[1], _SCHEMA).drop("o_orderpriority")
    merged = union_ingest([df1, df2])
    assert merged.count() == df1.count() + df2.count()
    assert merged.filter("o_orderpriority IS NULL").count() == df2.count()


def test_synthetic_source_distributed(spark):
    df = synthetic_frame(spark, 10_000, 3)
    assert df.columns == ["c0", "c1", "c2"]
    assert df.count() == 10_000
    stats = df.agg(F.min("c0"), F.max("c0")).first()
    assert 0 <= stats[0] and stats[1] < 100


def test_asof_join_matches_pandas_merge_asof(spark):
    """Union-window as-of join vs pandas merge_asof (allow_exact_matches=True,
    by=key) on a randomized problem."""
    import numpy as np

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 200), unit="s"),
            "lid": np.arange(200),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 80), unit="s"),
            "rv": rng.normal(size=80),
        }
    )
    right = right.drop_duplicates(subset=["k", "t"]).sort_values("t").reset_index(drop=True)

    expected = pd.merge_asof(left, right, on="t", by="k", allow_exact_matches=True)

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = asof_join(sl, sr, key="k", ts="t", carry_cols=["rv"]).toPandas()
    merged = expected.merge(got, on="lid", suffixes=("_exp", "_got"))
    assert len(merged) == len(expected)
    for _, row in merged.iterrows():
        if pd.isna(row["rv_exp"]):
            assert pd.isna(row["rv_got"]), row
        else:
            assert row["rv_exp"] == pytest.approx(row["rv_got"]), row


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_pandas(spark, direction):
    """forward / nearest directions vs pandas merge_asof on the same
    randomized problem (backward is covered above)."""
    import numpy as np

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 200), unit="s"),
            "lid": np.arange(200),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 80), unit="s"),
            "rv": rng.normal(size=80),
        }
    )
    right = right.drop_duplicates(subset=["k", "t"]).sort_values("t").reset_index(drop=True)

    expected = pd.merge_asof(
        left, right, on="t", by="k", allow_exact_matches=True, direction=direction
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key="k",
        ts="t",
        carry_cols=["rv"],
        direction=direction,
    ).toPandas()
    merged = expected.merge(got, on="lid", suffixes=("_exp", "_got"))
    assert len(merged) == len(expected)
    for _, row in merged.iterrows():
        if pd.isna(row["rv_exp"]):
            assert pd.isna(row["rv_got"]), row
        else:
            assert row["rv_exp"] == pytest.approx(row["rv_got"]), row


def test_one_hot_parity(spark, sf_dir):
    from timedf_spark import ml

    orders = load_table(spark, sf_dir, "orders")
    dummies = ml.one_hot(orders, "o_orderstatus", values=["F", "O", "P", "X"])
    assert "o_orderstatus_X" in dummies.columns  # missing-class column exists
    row = dummies.agg(
        F.sum("o_orderstatus_X"),
        F.sum(F.col("o_orderstatus_F") + F.col("o_orderstatus_O") + F.col("o_orderstatus_P")),
    ).first()
    assert row[0] == 0
    assert row[1] == orders.count()


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    """documents → JSONL (gzip) → read_jsonl with explicit schema ==
    original rows; corrupt lines surface per-row, not as job failure."""
    import gzip
    import json as json_mod
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from timedf_spark.sources import load_table
    from timedf_spark.sources.readers import read_jsonl

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    rows = [r.asDict() for r in docs.collect()]
    path = os.path.join(str(tmp_path), "docs.jsonl.gz")
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(json_mod.dumps(r) + "\n")
        f.write("{this is not json\n")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    back = read_jsonl(spark, path, schema).cache()
    good = back.filter("_corrupt_record IS NULL").drop("_corrupt_record")
    assert good.count() == len(rows)
    assert back.filter("_corrupt_record IS NOT NULL").count() == 1
    orig = {(r["doc_id"], r["lang"], r["text"]) for r in rows}
    got = {(r["doc_id"], r["lang"], r["text"]) for r in good.collect()}
    assert got == orig


def test_safe_targz_extracts_and_blocks_traversal(tmp_path):
    """Normal members extract; '../'-escaping members and outward links are
    rejected before touching the filesystem (ref guard: ny_taxi_ml tar
    extraction)."""
    import tarfile

    import pytest as _pytest

    from timedf_spark.sources.archive import filter_keys, safe_extract_targz

    good = tmp_path / "good.tar.gz"
    with tarfile.open(good, "w:gz") as t:
        p = tmp_path / "data.csv"
        p.write_text("a,b\n1,2\n")
        t.add(p, arcname="data.csv")
        t.add(p, arcname="sub/dir/data2.csv")
    out = tmp_path / "out"
    names = safe_extract_targz(str(good), str(out))
    assert sorted(names) == ["data.csv", "sub/dir/data2.csv"]
    assert (out / "sub" / "dir" / "data2.csv").read_text().startswith("a,b")

    evil = tmp_path / "evil.tar.gz"
    with tarfile.open(evil, "w:gz") as t:
        p = tmp_path / "x.txt"
        p.write_text("boom")
        t.add(p, arcname="../escape.txt")
    with _pytest.raises(ValueError, match="unsafe"):
        safe_extract_targz(str(evil), str(tmp_path / "out2"))
    assert not (tmp_path / "escape.txt").exists()

    # regex key filter (S3 sync's selection logic, offline)
    keys = ["d/2014.csv.gz", "d/2015.csv.gz", "d/readme.md"]
    assert filter_keys(keys, r"\.csv\.gz$") == ["d/2014.csv.gz", "d/2015.csv.gz"]
    assert filter_keys(keys, None) == keys


def test_safe_targz_blocks_hardlink_root_relative_escape(tmp_path):
    """Hardlink targets resolve against the EXTRACTION ROOT in CPython
    tarfile, not the member's directory: a member 'sub/a' with linkname
    '../x' links to dest/../x (outside), even though member-dir resolution
    would say dest/x (inside). The guard must use tarfile's base."""
    import io
    import tarfile

    import pytest as _pytest

    from timedf_spark.sources.archive import safe_extract_targz

    outside = tmp_path / "x"
    outside.write_text("victim")
    dest = tmp_path / "dest"

    evil = tmp_path / "hardlink.tar.gz"
    with tarfile.open(evil, "w:gz") as t:
        payload = b"inner"
        fi = tarfile.TarInfo("sub/inner.txt")
        fi.size = len(payload)
        t.addfile(fi, io.BytesIO(payload))
        ln = tarfile.TarInfo("sub/a")
        ln.type = tarfile.LNKTYPE
        ln.linkname = "../x"  # dest/../x per tarfile; dest/x per member-dir
        t.addfile(ln)
    with _pytest.raises(ValueError, match="unsafe link"):
        safe_extract_targz(str(evil), str(dest))
    assert outside.read_text() == "victim"

    # a root-relative hardlink to a previously extracted member stays legal
    ok = tmp_path / "hardlink_ok.tar.gz"
    with tarfile.open(ok, "w:gz") as t:
        payload = b"inner"
        fi = tarfile.TarInfo("sub/inner.txt")
        fi.size = len(payload)
        t.addfile(fi, io.BytesIO(payload))
        ln = tarfile.TarInfo("sub/b")
        ln.type = tarfile.LNKTYPE
        ln.linkname = "sub/inner.txt"
        t.addfile(ln)
    dest2 = tmp_path / "dest2"
    names = safe_extract_targz(str(ok), str(dest2))
    assert "sub/b" in names
    assert (dest2 / "sub" / "b").read_text() == "inner"


def test_asof_join_null_right_attribute_not_skipped(spark):
    """A matching right row with a NULL carry attribute must yield NULL —
    not a stale value from an older right row (DuckDB ASOF semantics)."""
    import datetime as dt

    sl = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 30), 100)], "k int, t timestamp, lid int"
    )
    sr = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 5.0, "old"),
            (1, dt.datetime(2024, 1, 1, 0, 0, 20), None, "new"),
        ],
        "k int, t timestamp, rv double, tag string",
    )
    row = asof_join(sl, sr, key="k", ts="t", carry_cols=["rv", "tag"]).first()
    assert row["rv"] is None  # from the matching 00:00:20 row, not 5.0
    assert row["tag"] == "new"  # all carries come from the SAME right row


def test_kaggle_loader_offline_paths(tmp_path):
    """A7: everything except the network call is testable offline — the
    gated import raises the typed error, and extraction refuses traversal
    entries while extracting good ones."""
    import io
    import zipfile

    import pytest

    from timedf_spark.sources.kaggle import (
        KaggleUnavailable,
        load_competition,
        safe_extract_zip,
    )

    # no kaggle package in this container → typed error, non-interactive
    with pytest.raises(KaggleUnavailable):
        load_competition("some-competition", tmp_path)

    # good zip extracts
    good = tmp_path / "good.zip"
    with zipfile.ZipFile(good, "w") as zf:
        zf.writestr("data/train.csv", "a,b\n1,2\n")
    out = safe_extract_zip(good, tmp_path / "out")
    assert out == ["data/train.csv"]
    assert (tmp_path / "out" / "data" / "train.csv").read_text().startswith("a,b")

    # traversal entry is refused before writing anywhere — even when a
    # benign entry PRECEDES it (all-or-nothing: no partial extraction)
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("innocent.csv", "a\n")
        zf.writestr("../escape.txt", "nope")
    with pytest.raises(ValueError, match="escapes"):
        safe_extract_zip(evil, tmp_path / "out2")
    assert not (tmp_path / "escape.txt").exists()
    assert not (tmp_path / "out2" / "innocent.csv").exists()


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_tolerance_matches_pandas(spark, direction):
    """tolerance parity: matches beyond the window become NULL carries,
    per side before the nearest pick — exactly pandas merge_asof's
    tolerance semantics, on a randomized problem."""
    import numpy as np

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 200), unit="s"),
            "lid": np.arange(200),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "t": pd.to_datetime(rng.integers(0, 1_000_000, 60), unit="s"),
            "rv": rng.normal(size=60),
        }
    )
    right = right.drop_duplicates(subset=["k", "t"]).sort_values("t").reset_index(drop=True)

    tol_s = 20_000  # tight enough that many matches fall out of range
    expected = pd.merge_asof(
        left, right, on="t", by="k", allow_exact_matches=True,
        direction=direction, tolerance=pd.Timedelta(seconds=tol_s),
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key="k", ts="t", carry_cols=["rv"],
        direction=direction, tolerance_us=tol_s * 1_000_000,
    ).toPandas()
    merged = expected.merge(got, on="lid", suffixes=("_exp", "_got"))
    assert len(merged) == len(expected)
    n_null = int(merged["rv_exp"].isna().sum())
    assert 0 < n_null < len(merged), "tolerance not exercised by this data"
    for _, row in merged.iterrows():
        if pd.isna(row["rv_exp"]):
            assert pd.isna(row["rv_got"]), row
        else:
            assert row["rv_exp"] == pytest.approx(row["rv_got"]), row


def test_fan_out_size_gate(spark, sf_dir):
    """fan_out (r08/r09): the min_bytes floor is OPT-IN — the default
    (0) fans out any under-split scan (r08 shipped 24 MB as the default
    and regressed seven per-row-CPU queries, VERDICT r08 item 1); an
    explicit floor leaves sub-floor scans alone (the repartition costs
    more than the serialism there — A/B-measured on the jaccard/minhash
    pipelines at sf0.1)."""
    from timedf_spark.sources import fan_out, load_table

    docs = load_table(spark, sf_dir, "documents")
    assert fan_out(docs, min_bytes=24 << 20) is docs  # floored: no-op
    forced = fan_out(docs)  # default: partition-count-only behavior
    assert (
        forced.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
