"""Corpus profiling: the one-row health report a curation run logs
before and after each stage.

Every metric is EXACT and engine-portable (no sketches, no RNG), so the
report replays bit-for-bit in DuckDB (tests/test_report.py) and two
report runs over the same corpus always agree — the property that makes
reports diffable across pipeline versions.

Scale shape: one narrow aggregation pass over the documents (token
counts and duplicate-group facts via a content-hash groupBy, map-side
combined) plus one explode pass for the vocabulary count (distinct
60-bit token hashes — count_distinct over a bigint, not over raw
strings, so the shuffle moves 8-byte keys).  Both are linear in corpus
bytes with no driver-side state beyond the single result row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus profile: (n_docs, n_tokens, n_chars, distinct_texts,
    dup_docs, min_doc_tokens, max_doc_tokens, avg_doc_tokens, vocab_size).

    ``dup_docs`` counts documents beyond the first of each identical-text
    group (the rows doc-level exact dedup would drop);
    ``avg_doc_tokens`` is rounded to 6 places for cross-engine equality;
    ``vocab_size`` is the exact count of distinct tokens (via the
    portable md5-60-bit token hash — collisions at 2^60 are negligible
    and the hash replays in any engine).
    """
    toks = F.split(F.col(text_col), " ")
    per_doc = docs.select(
        F.size(toks).cast("bigint").alias("_n_toks"),
        F.length(text_col).cast("bigint").alias("_n_chars"),
        F.md5(F.col(text_col).cast("binary")).alias("_md5"),
    )
    base = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_n_toks").alias("n_tokens"),
        F.sum("_n_chars").alias("n_chars"),
        F.countDistinct("_md5").cast("bigint").alias("distinct_texts"),
        F.min("_n_toks").alias("min_doc_tokens"),
        F.max("_n_toks").alias("max_doc_tokens"),
        F.round(F.avg("_n_toks"), 6).alias("avg_doc_tokens"),
    ).withColumn("dup_docs", (F.col("n_docs") - F.col("distinct_texts")))
    vocab = (
        docs.select(F.explode(toks).alias("_tok"))
        .select(
            F.expr(
                "cast(conv(substr(md5(_tok), 1, 15), 16, 10) as bigint)"
            ).alias("_h")
        )
        .agg(F.countDistinct("_h").cast("bigint").alias("vocab_size"))
    )
    return base.crossJoin(vocab).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "distinct_texts",
        "dup_docs",
        "min_doc_tokens",
        "max_doc_tokens",
        "avg_doc_tokens",
        "vocab_size",
    )
