"""Skew-mitigation: salted joins for pathologically hot keys.

AQE's skew-join splitting (on in every session profile) handles most skew
by splitting oversized shuffle partitions at runtime. Salting is the
explicit fallback for the cases AQE can't fix — a *single* key carrying a
double-digit percentage of the fact table (a null-ish sentinel, a bot
user, a default category), where one reducer would still receive the whole
key even after partition splitting.

Construction (classic): the skewed (large) side gets a uniform random salt
in [0, n_salts); the small side is replicated n_salts times with every
salt value; the join key becomes (key, salt). The hot key's rows now
spread over n_salts reducers. Replication multiplies the small side by
n_salts — keep it for dimension-sized right sides only.

The salt uses a deterministic per-row hash (xxhash64 of the row's own
columns, not rand()) so results are reproducible and retries/speculative
tasks see the same salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salt_col", "null_split_left_join"]


def salt_col(df: DataFrame, n_salts: int, salt_source: str | None = None) -> F.Column:
    """Deterministic per-row salt in [0, n_salts). pmod, not abs(...)%n:
    abs(Long.MIN_VALUE) stays negative in Spark, and a negative salt would
    match no replicated salt value — silently dropping the row."""
    if salt_source is not None:
        return F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join of ``large`` ⋈ ``small`` on ``key`` with the large
    side salted across ``n_salts`` sub-keys.

    salt_source: column whose per-row hash drives the salt; defaults to
    every column of ``large`` (fully deterministic, no rand()).
    """
    salted_large = large.withColumn("_salt", salt_col(large, n_salts, salt_source))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(replicated_small, [key, "_salt"]).drop("_salt")


def null_split_left_join(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """LEFT OUTER equi-join equal to ``left.join(right, key, "left")`` but
    with NULL join keys split out BEFORE the shuffle.

    Why: an outer join must keep null-key rows, so Catalyst cannot push
    ``isnotnull(key)`` below the exchange the way it does for inner joins
    — every null-key row hashes to the same shuffle partition and lands on
    ONE reducer. Null is the single most common pathological hot key in
    practice (unattributed events, optional foreign keys), and at fact-
    table scale that reducer is the job. SQL NULL semantics guarantee a
    null key matches nothing, so the null stratum needs no join at all:
    filter it out (the surviving branch shuffles with isnotnull pushed
    down), null-extend it with the right side's columns as a pure
    projection (zero shuffle), and UNION the branches back.

    Both inputs must be free of column-name overlap besides ``key``.
    """
    right_cols = [c for c in right.columns if c != key]
    matched = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    unmatched = left.filter(F.col(key).isNull()).select(
        key,
        *[c for c in left.columns if c != key],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
    )
    return matched.unionByName(unmatched)
