"""Generate an N-times-sf0.1 synthetic dataset for the scale shakeout
(VERDICT r04 item 2): same generative statistics as the driver's
testdata — empirical vocab / length / lang / source distributions
bootstrapped from sf0.1, ~5% of documents emitted as mutated near-dup
copies (matches the observed linear pair density: 25 pairs / 500 docs at
sf0.01, 256 / 5000 at sf0.1), unit-norm random embeddings with labels
0..9, and a uniform price orders table.

Usage:  python tools/gen_scale.py [FACTOR] [OUT_DIR]
        (defaults: 10  /tmp/scale10x)

The output layout mirrors /root/testdata/sf*/: {table}.parquet dirs
readable by timedf_spark.sources.load_table. This is a TEST-DATA
generator, deliberately driver-side numpy (50k docs ~ 15 MB of text);
the engine's own distributed synthetic source is
sources/readers.synthetic_frame.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
DUP_RATE = 0.05
MUTATE_RATE = 0.10


def _empirical(rng: np.random.Generator, values: list, n: int) -> list:
    vals, counts = np.unique(np.asarray(values, dtype=object), return_counts=True)
    return list(rng.choice(vals, size=n, p=counts / counts.sum()))


def gen_documents(n: int, seed: int = 7) -> pa.Table:
    base = pq.read_table(os.path.join(BASE, "documents.parquet"))
    texts = base["text"].to_pylist()
    vocab_words, vocab_counts = np.unique(
        [w for t in texts for w in t.split()], return_counts=True
    )
    p_word = vocab_counts / vocab_counts.sum()
    lengths = [len(t.split()) for t in texts]
    rng = np.random.default_rng(seed)
    langs = _empirical(rng, base["lang"].to_pylist(), n)
    sources = _empirical(rng, base["source"].to_pylist(), n)

    out_texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < DUP_RATE:
            words = out_texts[rng.integers(0, i)].split()
            words = [
                (rng.choice(vocab_words) if rng.random() < MUTATE_RATE else w)
                for w in words
            ]
        else:
            ln = lengths[rng.integers(0, len(lengths))]
            words = list(rng.choice(vocab_words, size=ln, p=p_word))
        out_texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 11) -> pa.Table:
    """Unit-norm random embeddings with DUP_RATE planted near-duplicates
    (a slightly-perturbed copy of an earlier vector, cosine ≈ 0.99) — so
    true near-dup pair volume grows LINEARLY with n, matching the
    documents generator. Pure-random vectors gave a pair count driven by
    the tail of the random-cosine distribution (~n² · P[cos>τ]), which
    made the semantic-dedup shakeout exponent measure output growth, not
    operator scaling (VERDICT r05 item 4)."""
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(1, n):
        if rng.random() < DUP_RATE:
            src = vecs[rng.integers(0, i)]
            noisy = src + 0.15 * rng.standard_normal(dim).astype(np.float32)
            vecs[i] = noisy / np.linalg.norm(noisy)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def gen_events(n: int, n_users: int, seed: int = 17) -> pa.Table:
    """Same shape as the driver's events table: 30-day span of ascending
    µs timestamps, empirical event-type mix, uniform value, {"k": int}
    props JSON."""
    base = pq.read_table(os.path.join(BASE, "events.parquet"), columns=["event_type"])
    rng = np.random.default_rng(seed)
    types = _empirical(rng, base["event_type"].to_pylist(), n)
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n)) + np.int64(
        np.datetime64("2024-01-01", "us").astype("int64")
    )
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(np.round(rng.uniform(0.0, 500.0, n), 2), pa.float64()),
            "props": pa.array(
                ['{"k": %d}' % k for k in rng.integers(0, 100, n)], pa.string()
            ),
        }
    )


def gen_orders(n: int, seed: int = 13) -> pa.Table:
    rng = np.random.default_rng(seed)
    prices = np.round(rng.uniform(1000.0, 500000.0, n), 2)
    days = rng.integers(0, 2557, n)  # 1992-01-01 .. ~1999
    dates = (np.datetime64("1992-01-01") + days.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )
    status = np.where(rng.random(n) < 0.5, "O", np.where(rng.random(n) < 0.5, "F", "P"))
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(1, n // 10 + 2, n), pa.int64()),
            "o_orderstatus": pa.array(status, pa.string()),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [f"{p}-PRIORITY" for p in rng.integers(1, 6, n)], pa.string()
            ),
        }
    )


def gen_lineitem(n: int, n_orders: int, n_parts: int, n_supp: int, seed: int = 19) -> pa.Table:
    """Same shape/key-ranges as the driver's lineitem (FKs into the
    generated orders/part tables and a supplier key space scaled with
    the factor), so join-grain queries see 10x of everything."""
    rng = np.random.default_rng(seed)
    days = rng.integers(0, 2557, n)
    ship = (np.datetime64("1992-01-01") + days.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )
    return pa.table(
        {
            "l_orderkey": pa.array(np.sort(rng.integers(0, n_orders, n)), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_parts, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105000.0, n), 2)),
            "l_discount": pa.array(np.round(rng.uniform(0.0, 0.1, n), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, n), 2)),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n), pa.string()),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n), pa.string()),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        }
    )


def gen_customer(n: int, seed: int = 23) -> pa.Table:
    rng = np.random.default_rng(seed)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    return pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
            "c_mktsegment": pa.array(rng.choice(segs, n), pa.string()),
        }
    )


def gen_supplier(n: int, seed: int = 31) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "s_suppkey": pa.array(range(n), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)], pa.string()),
            "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
        }
    )


def gen_part(n: int, seed: int = 29) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "p_partkey": pa.array(range(n), pa.int64()),
            "p_name": pa.array([f"part {i}" for i in range(n)], pa.string()),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(11, 56, n)], pa.string()
            ),
            "p_type": pa.array(
                rng.choice(["ECONOMY", "STANDARD", "PROMO", "SMALL", "LARGE"], n),
                pa.string(),
            ),
            "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
            "p_retailprice": pa.array(np.round(rng.uniform(900.0, 999.9, n), 2)),
        }
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}x"
    # GEN_TABLES=lineitem,orders,... generates a subset (e.g. only the
    # graph-tier tables for the 1000x decade); GEN_CHUNKS=N splits each
    # fact table into N part files generated independently (per-chunk
    # seeds, disjoint key ranges where the column is a row id) so the
    # driver-side numpy working set stays bounded at any factor.
    only = os.environ.get("GEN_TABLES")
    only_set = {t.strip() for t in only.split(",")} if only else None
    chunks = max(1, int(os.environ.get("GEN_CHUNKS", "1")))
    os.makedirs(out, exist_ok=True)
    # builders: name -> (row_count, chunk_fn(chunk_rows, row_offset, seed))
    n_orders, n_parts, n_supp = 150000 * factor, 20000 * factor, 1000 * factor

    def _shift(table: pa.Table, col: str, off: int) -> pa.Table:
        import pyarrow.compute as pc

        idx = table.schema.get_field_index(col)
        return table.set_column(
            idx, col, pc.add(table.column(col), pa.scalar(off, pa.int64()))
        )

    builders = {
        "documents": (
            5000 * factor, 7,
            lambda n, off, seed: _shift(gen_documents(n, seed), "doc_id", off),
        ),
        "embeddings": (
            2000 * factor, 11,
            lambda n, off, seed: _shift(gen_embeddings(n, seed=seed), "vec_id", off),
        ),
        "orders": (
            150000 * factor, 13,
            lambda n, off, seed: _shift(gen_orders(n, seed), "o_orderkey", off),
        ),
        "events": (
            100000 * factor, 17,
            lambda n, off, seed: _shift(
                gen_events(n, 1500 * factor, seed), "event_id", off
            ),
        ),
        # lineitem has no row-id column: chunks draw FKs over the full
        # key spaces with distinct seeds — same distribution as one shot
        "lineitem": (
            600000 * factor, 19,
            lambda n, off, seed: gen_lineitem(n, n_orders, n_parts, n_supp, seed),
        ),
        "customer": (
            15000 * factor, 23,
            lambda n, off, seed: _shift(gen_customer(n, seed), "c_custkey", off),
        ),
        "part": (
            20000 * factor, 29,
            lambda n, off, seed: _shift(gen_part(n, seed), "p_partkey", off),
        ),
        "supplier": (
            1000 * factor, 31,
            lambda n, off, seed: _shift(gen_supplier(n, seed), "s_suppkey", off),
        ),
    }
    for name, (total, seed0, build) in builders.items():
        if only_set is not None and name not in only_set:
            continue
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        per = total // chunks
        written = 0
        for i in range(chunks):
            n = per if i < chunks - 1 else total - per * (chunks - 1)
            # chunk 0 keeps the table's historical seed so a 1-chunk run
            # is byte-identical to the pre-chunking generator
            table = build(n, written, seed0 if i == 0 else 1000 * seed0 + i)
            # bounded row groups: pyarrow's default writes ONE row group
            # per call, and Spark cannot split a file below row-group
            # granularity — a 500k-doc single-group file scans as one
            # task no matter how many cores exist (observed as the r08
            # 100x shingle straggler). 32k-row groups keep every
            # generated file splittable.
            pq.write_table(
                table, os.path.join(d, f"part-{i}.parquet"), row_group_size=32768
            )
            written += table.num_rows
        print(name, written, "->", d, f"({chunks} chunks)")
    # nation/region are scale-independent 25/5-row dimensions: copy them
    # verbatim so nation-joining queries run at every factor
    import shutil

    for dim in ("nation", "region"):
        src = os.path.join(BASE, f"{dim}.parquet")
        dst = os.path.join(out, f"{dim}.parquet")
        if os.path.exists(dst):
            continue
        # the driver's testdata ships these as single parquet FILES;
        # generated dirs from older rounds were directories — handle both
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        elif os.path.isfile(src):
            shutil.copyfile(src, dst)
        else:
            continue
        print(dim, "copied ->", dst)


if __name__ == "__main__":
    main()
