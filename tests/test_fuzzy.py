"""Fuzzy edit-distance join: blocked result must EQUAL brute force.

The q-gram prefix blocking (operators/fuzzy.py) claims losslessness via
the q-gram count lemma + prefix-filter lemma + a short-string branch.
This test attacks the claim where it is weakest: a tiny alphabet (many
near-pairs, heavy gram collisions → hot grams land in prefixes), string
lengths straddling the short-branch boundary, and empty strings.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from timedf_spark.operators.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(vocab: list[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    for i, a in enumerate(vocab):
        for b in vocab[i + 1 :]:
            lo, hi = sorted((a, b))
            d = _lev(lo, hi)
            if d <= k:
                out.add((lo, hi, d))
    return out


def test_blocked_equals_brute_force_small_alphabet(spark):
    rng = random.Random(7)
    vocab = list({
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 7)))
        for _ in range(160)
    })
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, k=2).collect()
    }
    assert got == _brute(sorted(vocab), 2)


def test_blocked_equals_brute_force_mixed_lengths(spark):
    rng = random.Random(21)
    vocab = list({
        "".join(rng.choice("abcde") for _ in range(rng.randint(3, 12)))
        for _ in range(250)
    })
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, k=1).collect()
    }
    assert got == _brute(sorted(vocab), 1)


def test_duplicates_and_nulls_collapse(spark):
    df = spark.createDataFrame(
        [("red bolt",), ("red bolt",), ("red bolts",), (None,)], "name string"
    )
    rows = edit_distance_pairs(df, k=2).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in rows] == [
        ("red bolt", "red bolts", 1)
    ]


def test_prefix_blocking_prunes_candidates(spark):
    """The scale claim: candidate volume from prefix blocking must be
    strictly below the all-shared-gram inverted index on clustered data
    (same-suffix names sharing hot grams)."""
    vocab = [f"widget model {i:03d}" for i in range(60)] + [
        f"gadget series {i:03d}" for i in range(60)
    ]
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    # the full inverted index pairs every two names sharing ANY gram —
    # here every name shares the hot " model "/" series " grams and digits
    from timedf_spark.operators.fuzzy import _qgrams_expr, candidate_pairs

    grams = df.select(
        "name", F.explode(F.expr(_qgrams_expr("name", 2))).alias("g")
    )
    inv = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")),
        )
        .select("a.name", "b.name")
        .distinct()
        .count()
    )
    n_cands = candidate_pairs(df, k=2).count()
    assert n_cands < inv, (n_cands, inv)
    # and the blocked result is still exact
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, k=2).collect()
    }
    assert got == _brute(sorted(vocab), 2)


def test_probe_equals_brute_force_small_alphabet(spark):
    """Batch-vs-corpus probe must equal the brute-force cross join on the
    same adversarial tiny-alphabet vocabulary (incl. strings only in the
    batch, whose grams are absent from the corpus frequency order)."""
    from timedf_spark.operators.fuzzy import edit_distance_probe

    rng = random.Random(13)
    vocab = list({
        "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
        for _ in range(200)
    })
    corpus = vocab[: len(vocab) * 2 // 3]
    batch = vocab[len(vocab) // 2 :]  # overlaps corpus + fresh strings
    cdf = spark.createDataFrame([(v,) for v in corpus], "name string")
    bdf = spark.createDataFrame([(v,) for v in batch], "name string")
    got = {
        (r["probe"], r["match"], r["dist"])
        for r in edit_distance_probe(cdf, bdf, k=2).collect()
    }
    want = {
        (b, c, _lev(b, c))
        for b in set(batch)
        for c in set(corpus)
        if _lev(b, c) <= 2
    }
    assert got == want
