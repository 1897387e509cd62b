"""BPE trainer/encoder tests: exact merge tables on a crafted corpus,
reconstruction invariants, and the distributed encode path."""

from __future__ import annotations

from timedf_spark.operators import bpe
from timedf_spark.sources import load_table


def _toy_docs(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_table_exact_on_crafted_corpus(spark):
    """Hand-checkable greedy BPE: 'est' dominates (newest x6 + widest x2),
    then 'low' (x7 incl. lower), ties broken lexicographically."""
    merges = bpe.train_bpe(_toy_docs(spark), n_merges=6)
    assert [(a, b, f) for a, b, f in merges] == [
        ("e", "s", 8),
        ("es", "t", 8),
        ("est", "</w>", 8),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
    ]


def test_encoding_reconstructs_words(spark, sf_dir):
    """BPE is a segmentation: concatenating a word's tokens must give back
    word + end marker, for every corpus word under the trained merges."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, n_merges=40)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    words = [r["word"] for r in bpe.word_counts(docs).limit(200).collect()]
    assert words
    for w in words:
        assert "".join(bpe._encode_word(w, ranks)) == w + "</w>"


def test_distributed_encode_token_totals(spark):
    """End-marker count == word count per doc (every word ends in exactly
    one token carrying </w>), and token totals are exact integers."""
    docs = _toy_docs(spark)
    merges = bpe.train_bpe(docs, n_merges=6)
    enc = bpe.encode_tokens(docs, merges)
    rows = enc.collect()
    per_doc_end = {}
    for r in rows:
        if r["token"].endswith("</w>"):
            per_doc_end[r["doc_id"]] = per_doc_end.get(r["doc_id"], 0) + r["n"]
    assert per_doc_end == {0: 5, 1: 4, 2: 6}


def test_train_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert bpe.train_bpe(docs, n_merges=25) == bpe.train_bpe(docs, n_merges=25)


def test_frequency_floor_bounds_dictionary_not_merges(spark):
    """min_freq drops rare word-forms distributed-side: 'widest' (x2) and
    'lower' (x2) vanish under floor 3, so the surviving dictionary is
    exactly {low x5, newest x6} and greedy BPE runs on it alone — the
    floor bounds driver memory, and the merge table is still the exact
    greedy table of the floored dictionary (hand-traced)."""
    docs = _toy_docs(spark)
    floored = bpe.train_bpe(docs, n_merges=6, min_freq=3)
    assert floored == [
        ("e", "s", 6),
        ("e", "w", 6),
        ("es", "t", 6),
        ("est", "</w>", 6),
        ("ew", "est</w>", 6),
        ("n", "ewest</w>", 6),
    ]
    # under the floor, the surviving dictionary is exactly {low, newest}
    rows = bpe.word_counts(docs).filter("cnt >= 3").collect()
    assert {r["word"] for r in rows} == {"low", "newest"}
