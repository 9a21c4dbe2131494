"""Line-level corpus cleaning — the C4/CCNet/RefinedWeb stage that runs
BEFORE document-level dedup: in-row line heuristics, within-document
duplicate-line removal, and cross-document boilerplate line removal
(nav bars, cookie banners, footers — lines whose *document frequency*
across the corpus exceeds a cap carry no content signal).

Spark-first shapes:

- ``clean_lines`` / ``dedup_lines_within_doc`` are NARROW, zero-shuffle
  in-row array programs (``split`` -> ``filter``/``aggregate`` ->
  ``array_join``) — pure Catalyst higher-order functions, no Python in
  the plan, cost linear in corpus bytes with no exchange at any scale.
- ``boilerplate_line_stats`` is ONE map-side-combined aggregation over
  exploded (line-hash, doc) rows — the same heavy-hitter derivation as
  the hot-shingle cap in operators/dedup.py:32 (the boilerplate set is
  small by construction: only hashes with df > cap survive).
- ``remove_boilerplate_lines`` broadcasts that hot set into an in-row
  ``filter`` over each document's line array — the corpus itself is
  never shuffled, re-assembly needs no sort, and document order is
  trivially preserved because lines never leave their row.  At 100 TB
  the only exchange is the line-hash aggregation; everything else is
  narrow.

The reference has no line-level stage (its documents are API JSON, not
web text) — this is part of the beyond-parity training-data brief.
Heuristics follow the published C4 cleaning rules (Raffel et al. 2020
§2.2: terminal punctuation, >=3 words, brace/lorem/cookie filters) and
the CCNet/RefinedWeb shared-line dedup (Wenzek et al. 2019 §4.1,
Penedo et al. 2023 §3.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: substrings whose presence drops a line (C4 §2.2 policy set, lowercase)
BLOCK_SUBSTRINGS = ("lorem ipsum", "javascript", "cookie", "{", "}")

#: default document-frequency cap for boilerplate lines
DEFAULT_MAX_DOC_FREQ = 10

#: lines shorter than this many characters are never treated as
#: boilerplate (short lines — "Yes.", bullets — collide by chance)
DEFAULT_MIN_LINE_CHARS = 15


def _line_array(text: Column) -> Column:
    """Split into trimmed lines, dropping empties."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def _keep_line(
    line: Column,
    min_words: int,
    require_terminal_punct: bool,
) -> Column:
    """The C4 per-line keep predicate, as a Catalyst boolean."""
    lower = F.lower(line)
    keep = F.size(F.split(line, " +")) >= F.lit(min_words)
    if require_terminal_punct:
        keep = keep & line.rlike('[.!?"。！？」]$')
    for s in BLOCK_SUBSTRINGS:
        keep = keep & ~lower.contains(s)
    return keep


def clean_lines(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = False,
    min_doc_lines: int = 1,
) -> DataFrame:
    """C4-style in-row line cleaning: rebuild each document from the
    lines passing :func:`_keep_line`; drop documents left with fewer
    than ``min_doc_lines`` lines.  Adds ``n_lines_dropped``.

    Narrow and zero-shuffle (plan-pinned in tests/test_lines.py)."""
    lines = _line_array(F.col(text_col))
    kept = F.filter(
        lines, lambda l: _keep_line(l, min_words, require_terminal_punct)
    )
    return (
        docs.withColumn("_lines", lines)
        .withColumn("_kept", kept)
        .withColumn(
            "n_lines_dropped", F.size("_lines") - F.size("_kept")
        )
        .filter(F.size("_kept") >= min_doc_lines)
        .withColumn(text_col, F.array_join("_kept", "\n"))
        .drop("_lines", "_kept")
    )


def dedup_lines_within_doc(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Keep only the FIRST occurrence of each exact line within a
    document (repeated paragraphs, duplicated nav blocks).

    In-row ``aggregate`` fold appending a line only when not yet seen —
    O(lines²) per document (array_contains scan), fine for real
    documents (hundreds of lines), zero-shuffle at any corpus size."""
    dedup = F.aggregate(
        _line_array(F.col(text_col)),
        F.array().cast("array<string>"),
        lambda acc, l: F.when(
            F.array_contains(acc, l), acc
        ).otherwise(F.concat(acc, F.array(l))),
    )
    return docs.withColumn(text_col, F.array_join(dedup, "\n"))


def boilerplate_line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
) -> DataFrame:
    """(line_hash, df): document frequency of every qualifying line.

    ``array_distinct`` BEFORE the explode makes the count a true
    document frequency (a line repeated inside one doc counts once)
    without a (line, doc) distinct shuffle — the only exchange is the
    map-side-combined groupBy on the hash."""
    lines = F.array_distinct(
        F.filter(
            _line_array(F.col(text_col)),
            lambda l: F.length(l) >= F.lit(min_line_chars),
        )
    )
    return (
        docs.select(F.col(id_col), F.explode(lines).alias("line"))
        .select(F.md5(F.col("line")).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count("*").cast("bigint").alias("df"))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = DEFAULT_MAX_DOC_FREQ,
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Remove lines appearing in more than ``max_doc_freq`` documents
    across the corpus (CCNet/RefinedWeb shared-line dedup).  Adds
    ``n_boilerplate_dropped``.

    The hot set (df > cap) is the corpus's heavy hitters — small by
    construction — so it is collected onto the driver and shipped as an
    ``isin`` literal set (Catalyst folds >10 values to InSet, an O(1)
    hash probe per line) inside an in-row line filter: the corpus is
    never shuffled and line order is preserved for free.  A guard
    raises if the hot set exceeds ``_MAX_HOT_LINES`` (a corpus whose
    boilerplate vocabulary is that large wants a bigger cap, and the
    failure should be loud, not a driver OOM).

    Pass a precomputed ``stats`` (from :func:`boilerplate_line_stats`,
    e.g. persisted for a corpus and reused across increments) to skip
    the frequency pass."""
    if stats is None:
        stats = boilerplate_line_stats(docs, text_col, id_col, min_line_chars)
    hot_rows = (
        stats.filter(F.col("df") > max_doc_freq)
        .select("line_hash")
        .limit(_MAX_HOT_LINES + 1)
        .collect()
    )
    if len(hot_rows) > _MAX_HOT_LINES:
        raise ValueError(
            f"boilerplate hot set exceeds {_MAX_HOT_LINES} lines at "
            f"max_doc_freq={max_doc_freq}; raise the cap or pre-filter"
        )
    hot = [r.line_hash for r in hot_rows]
    lines = _line_array(F.col(text_col))
    if not hot:
        return docs.withColumn("n_boilerplate_dropped", F.lit(0))
    kept = F.filter(
        lines,
        lambda l: (F.length(l) < F.lit(min_line_chars))
        | ~F.md5(l).isin(hot),
    )
    return (
        docs.withColumn("_lines", lines)
        .withColumn("_kept", kept)
        .withColumn(
            "n_boilerplate_dropped", F.size("_lines") - F.size("_kept")
        )
        .withColumn(text_col, F.array_join("_kept", "\n"))
        .drop("_lines", "_kept")
    )


#: driver-collect guard for the boilerplate hot set (same rationale as
#: the pack_shards bucket guard, operators/packing.py)
_MAX_HOT_LINES = 100_000
