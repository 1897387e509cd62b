"""BPE tokenizer training + distributed encoding over a document corpus
(LLM-data-pipeline extension; no reference counterpart — SURVEY.md §2
extension layer, same family as token counting / token-budget packing).

Scale decomposition (the part that matters at 100 TB):

- **Corpus-scale work is exactly ONE aggregation.** Classic BPE (Sennrich
  et al., "Neural Machine Translation of Rare Words with Subword Units",
  ACL 2016) trains on the WORD-FREQUENCY dictionary, not the raw token
  stream — so the only pass over the corpus is a distributed word count
  (explode → groupBy word → sum). 100 TB of text collapses to a
  vocabulary-sized table (10^5-10^7 rows) before any merge logic runs.
- **The merge loop runs on that dictionary, driver-side, under an
  explicit cardinality guard** (default 200k distinct words — far above
  any natural-language corpus' word-form count after frequency floor).
  Each merge is O(affected words); the loop never touches the corpus.
  This mirrors every production BPE trainer (subword-nmt, HF tokenizers):
  distributing the argmax-per-merge would spend a full Spark job per
  merge round for a dictionary that fits in one executor's L2 cache.
- **Encoding is distributed and embarrassingly parallel**: the learned
  merge ranks broadcast to an Arrow-batched UDF; each document encodes
  independently — no shuffle until the (tiny) token-count aggregate.

Determinism: merge ties (equal pair frequency) break lexicographically on
the pair itself; word splitting is on single spaces (the corpus
convention shared by every text operator here). Training is therefore a
pure function of the corpus — tests pin exact merge tables on crafted
corpora and exact token counts end-to-end.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "encode_tokens", "bpe_merge_table"]

_END = "</w>"  # end-of-word marker (merges can't cross word boundaries)
_VOCAB_GUARD = 200_000


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency dictionary — the ONLY corpus-scale pass."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    vocab_guard: int = _VOCAB_GUARD,
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)] in
    merge order. Exact greedy BPE — at each step the globally most
    frequent adjacent symbol pair merges, ties broken lexicographically.

    ``min_freq`` is the frequency floor for 10M+-word-form dictionaries
    (web-scale corpora with typos/codes/URLs have unbounded word-form
    counts but Zipfian mass): words rarer than the floor are dropped
    FROM THE DISTRIBUTED AGGREGATE — the driver only ever sees the
    surviving dictionary, so driver memory is bounded by the floor, not
    the corpus. The deviation from exact BPE is principled: a pair
    occurring only inside sub-floor words can contribute at most
    (min_freq - 1) × (number of dropped word-forms containing it) to any
    merge count — with the default floors this is noise next to the
    millions-scale counts that drive early merges (the same trade
    subword-nmt's --min-frequency makes)."""
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        wc = wc.filter(F.col("cnt") >= min_freq)
    rows = wc.collect()
    assert len(rows) <= vocab_guard, (
        f"word-form dictionary {len(rows)} exceeds guard {vocab_guard}; "
        "raise the guard or apply a frequency floor first"
    )
    # word → (symbol tuple, count)
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + (_END,)
        vocab[syms] = vocab.get(syms, 0) + int(r["cnt"])

    # pair frequencies + inverted index pair → words containing it
    pair_freq: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pair_freq[(a, b)] += cnt
            pair_words[(a, b)].add(syms)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_freq:
            break
        # deterministic argmax: max freq, then lexicographically smallest pair
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        if freq <= 0:
            break
        merges.append((a, b, freq))
        merged = a + b
        # rewrite only the words that contain the pair (inverted index)
        for syms in list(pair_words[(a, b)]):
            cnt = vocab.pop(syms, 0)
            if cnt == 0:
                continue
            # remove old pair contributions
            for p in zip(syms, syms[1:]):
                pair_freq[p] -= cnt
                if pair_freq[p] <= 0:
                    del pair_freq[p]
                pair_words[p].discard(syms)
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            vocab[new_syms] = vocab.get(new_syms, 0) + cnt
            for p in zip(new_syms, new_syms[1:]):
                pair_freq[p] += cnt
                pair_words[p].add(new_syms)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        # lowest-rank (earliest-learned) applicable merge wins — the
        # standard BPE inference rule
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE encoding: (doc_id, token, n) per document. The merge
    table broadcasts inside the Arrow UDF closure; encoding caches per
    distinct word within each batch (Zipf makes the hit rate high), and
    nothing shuffles until the per-doc token counts."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf("map<string, int>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            counts: Counter = Counter()
            for w in (t or "").split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                counts.update(toks)
            out.append(dict(counts))
        return pd.Series(out)

    return (
        docs.select(id_col, encode(F.col(text_col)).alias("tok_counts"))
        .select(id_col, F.explode("tok_counts").alias("token", "n"))
    )


def bpe_merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Merge list → DataFrame (rank, left, right, merged, freq)."""
    return spark.createDataFrame(
        [(i, a, b, a + b, f) for i, (a, b, f) in enumerate(merges)],
        "rank int, left string, right string, merged string, freq long",
    )
