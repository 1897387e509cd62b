"""Round-17: readability — independent Python recomputation."""

from __future__ import annotations

import re

from timedf_spark.queries.round17 import readability_by_source
from timedf_spark.sources import load_table


def _tdiv(a: int, b: int) -> int:
    return (abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)


def test_readability_python_recomputation(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents").select("source", "text").collect()
    )
    per_source: dict = {}
    for r in docs:
        text = r["text"]
        w = len(text.split(" "))
        if w == 0:
            continue
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        syl = len(re.findall(r"[aeiouy]+", text.lower()))
        f1000 = _tdiv(206835 * s * w - 1015 * w * w - 84600 * syl * s, s * w)
        acc = per_source.setdefault(r["source"], [0, 0, 0, 0])
        acc[0] += 1
        acc[1] += f1000
        acc[2] += syl
        acc[3] += w
    expect = {
        src: (n, _tdiv(fsum, n), (sylsum * 1000) // wsum)
        for src, (n, fsum, sylsum, wsum) in per_source.items()
    }
    got = {
        r["source"]: (r["n_docs"], r["flesch_x1000"], r["syl_per_word_x1000"])
        for r in readability_by_source(spark, sf_dir).collect()
    }
    assert got == expect
