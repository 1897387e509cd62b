"""Z-order (Morton-curve) data layout for multi-column scan pruning.

``write_partitioned`` prunes on ONE directory key and ``write_bucketed``
co-locates ONE join key; neither helps the scan that filters on *either*
of two columns (``WHERE user_id = ? `` today, ``WHERE ts BETWEEN ?`` in
the next query). Sorting the file linearly by column A clusters A's
min/max footer ranges perfectly — and leaves column B's ranges spanning
the whole domain in every file, so B-predicates skip nothing.

Z-ordering interleaves the bits of both columns into one sort key: files
become axis-aligned tiles of the (A, B) plane, so the parquet footer
min/max of EACH column is tight in every file, and a range predicate on
either column overlaps only the tiles it touches — O(√files) for 2-D
instead of all of them. This is the same layout decision as Delta Lake's
``OPTIMIZE ZORDER BY`` and the classic UB-tree; here it is a pure
write-time transformation on stock parquet with no table format needed
(the reader needs no cooperation beyond ordinary footer-stats skipping).

Mechanics:
1. one aggregate computes each column's [min, max];
2. each value scales to a ``bits``-bit integer rank (linear min-max by
   default — callers with heavy skew should pre-bucket to quantile ranks
   first; the curve only equidistributes what the scaling spreads);
3. bits interleave into the Morton code — for two columns via the
   standard mask-spreading identity (5 bitwise ops per column, all
   codegen'd JVM expressions, no UDF);
4. ``repartitionByRange(zval)`` + ``sortWithinPartitions(zval)`` makes
   each output file one contiguous curve segment (= one tile).

The z-value is layout-only: it never lands in the data (dropped after
the sort), so readers see the original schema and rely on ordinary
min/max skipping. Scaling constants are computed once driver-side from
the one aggregate — deterministic, corpus-size-independent work.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_zordered", "zorder_key"]

_BITS = 16  # per-column resolution; 2 cols × 16 bits = 32-bit z-value


def _spread_bits_16(col: F.Column) -> F.Column:
    """Spread a 16-bit int's bits to even positions of a 32-bit int
    (abcd → 0a0b0c0d), the textbook Morton mask cascade."""
    x = col
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def _scaled_rank(col: str, lo: float, hi: float, bits: int) -> F.Column:
    """Linear min-max scale to [0, 2^bits - 1]. Layout-only arithmetic:
    double rounding here can at worst move a row one tile over."""
    top = (1 << bits) - 1
    if hi <= lo:  # constant column: everything in tile 0
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.greatest((scaled * top).cast("long"), F.lit(0)), F.lit(top)
    )


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = _BITS
) -> F.Column:
    """Morton z-value column over two numeric columns (one stats
    aggregate to learn the scaling; bit math is all JVM expressions)."""
    assert len(cols) == 2, "zorder_key interleaves exactly two columns"
    assert 1 <= bits <= 16, bits
    stats = df.agg(
        *[f(c).cast("double").alias(f"{n}_{c}")
          for c in cols for n, f in (("lo", F.min), ("hi", F.max))]
    ).collect()[0]
    spread = [
        _spread_bits_16(
            _scaled_rank(c, stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        )
        for c in cols
    ]
    return spread[0].bitwiseOR(F.shiftleft(spread[1], 1))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as parquet z-ordered on two columns: ``n_files``
    contiguous curve segments, original schema (the z-value is dropped)."""
    zval = zorder_key(df, cols, bits)
    (
        df.withColumn("_zval", zval)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )
