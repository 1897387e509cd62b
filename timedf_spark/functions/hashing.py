"""Shared cross-engine deterministic hash expressions.

One definition for the md5-prefix → bigint doc-id hash used by every
hash-threshold sampler (corpus_mix's rate mix, temperature_mix's T=2
mix): the Spark and DuckDB texts must stay in lock-step or the two
samplers silently diverge from their oracles. 15 hex chars = 60 bits,
safely inside int64.
"""

from __future__ import annotations

__all__ = ["DOC_HASH_SPARK", "DOC_HASH_DUCK"]

DOC_HASH_SPARK = "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
DOC_HASH_DUCK = "(('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT)"
