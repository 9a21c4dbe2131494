"""Text normalization (operators/normalize.py) vs a pure-Python
replica; the Catalyst path is plan-pinned narrow/JVM-side and the
whole operator is idempotent."""

from __future__ import annotations

import re
import unicodedata

import pytest

from jobcan_data_integrator_spark.operators.normalize import normalize_text

DOCS = [
    (0, "plain  text   with  runs"),
    (1, "tabs\t\tand \t mixed   runs"),
    (2, "lines \n  kept\nintact  "),
    (3, "zero​width‍ chars﻿"),
    (4, "ctrl\x00chars\x07here\x1f!"),
    (5, "ＦＵＬＬｗｉｄｔｈ ﬁ ligature ①"),  # NFKC targets
    (6, "MiXeD Case"),
]


def _replica(text, lowercase=False, nfkc=False):
    if nfkc:
        text = unicodedata.normalize("NFKC", text)
    text = re.sub("[​‌‍⁠﻿]", "", text)
    text = re.sub("[\x00-\x08\x0b-\x1f\x7f]", "", text)
    text = re.sub("[ \t]+", " ", text)
    text = re.sub(" ?\n ?", "\n", text).strip()
    if lowercase:
        text = text.lower()
    return text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


@pytest.mark.parametrize("nfkc", [False, True])
@pytest.mark.parametrize("lowercase", [False, True])
def test_matches_replica(spark, docs, lowercase, nfkc):
    got = {
        r.doc_id: r.text
        for r in normalize_text(docs, lowercase=lowercase, nfkc=nfkc).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _replica(text, lowercase, nfkc), doc_id


def test_nfkc_actually_folds(spark, docs):
    out = {r.doc_id: r.text for r in normalize_text(docs, nfkc=True).collect()}
    assert out[5] == "FULLwidth fi ligature 1"


def test_idempotent(spark, docs):
    once = normalize_text(docs, lowercase=True, nfkc=True)
    twice = normalize_text(once, lowercase=True, nfkc=True)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_catalyst_path_plan(spark, docs):
    plan = (
        normalize_text(docs)  # nfkc off: the common path
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def test_nfkc_path_is_arrow_only(spark, docs):
    plan = (
        normalize_text(docs, nfkc=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan, plan
    assert "Exchange" not in plan, plan  # still narrow


def test_normalization_makes_dedup_hashes_collide(spark):
    """The reason this runs before hashing: byte-different renderings
    of the same string must land in one exact-dedup group."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "Ｃａｆé   ﬁne"), (1, "Café ﬁne"), (2, "Café fine")],
        "doc_id bigint, text string",
    )
    n = normalize_text(df, nfkc=True)
    hashes = {r.h for r in n.select(F.md5("text").alias("h")).collect()}
    assert len(hashes) == 1
