"""Text normalization — the CCNet/Dolma cleanup pass that runs before
hashing, shingling, or tokenizing (Wenzek et al. 2019 normalize text
before dedup hashing for exactly this reason: two byte-different
renderings of the same string must collide).

Everything expressible in Catalyst stays JVM-side and zero-shuffle:
whitespace collapsing, control-character stripping, lowercasing, and
zero-width/BOM removal are ``regexp_replace``/``lower`` chains inside
one narrow projection (plan-pinned: no Python nodes, no exchange).

Unicode NFKC canonicalization is the ONE step Spark has no built-in
for (full-width → ASCII, ligature expansion, compatibility forms) — it
runs as an Arrow-batched ``mapInPandas`` stage, the engine's declared
slow path (same stance as the multimodal decode,
operators/multimodal.py): vectorized per batch, never per-row Python,
and OFF by default so the common path stays pure Catalyst.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.session import ensure_pyfiles

#: zero-width + BOM code points stripped outright
_ZERO_WIDTH = "[​‌‍⁠﻿]"

#: control characters except \t and \n (kept: document structure)
_CONTROL = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    nfkc: bool = False,
) -> DataFrame:
    """Normalize ``text_col`` in place.  Order matters and is fixed:
    NFKC (optional, Arrow stage) -> strip zero-width/BOM -> strip
    control chars -> collapse runs of spaces/tabs and trim line ends
    (newlines preserved — line-level operators depend on them) ->
    lowercase (optional).

    Deterministic and idempotent: normalizing twice is a no-op, so
    replayed batches rewrite identical rows (pinned in
    tests/test_normalize.py)."""
    if nfkc:
        docs = _nfkc(docs, text_col)
    c = F.col(text_col)
    c = F.regexp_replace(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _CONTROL, "")
    if collapse_whitespace:
        c = F.regexp_replace(c, "[ \\t]+", " ")
        c = F.regexp_replace(c, " ?\\n ?", "\n")
        c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return docs.withColumn(text_col, c)


def _nfkc(docs: DataFrame, text_col: str) -> DataFrame:
    """NFKC via mapInPandas — vectorized ``pd.Series.map`` over Arrow
    batches; schema is preserved exactly (only ``text_col`` rewritten)."""
    ensure_pyfiles(docs.sparkSession)
    schema = docs.schema

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: unicodedata.normalize("NFKC", s)
                if isinstance(s, str)
                else s
            )
            yield pdf

    return docs.mapInPandas(apply, schema)
