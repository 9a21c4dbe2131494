"""Line-level cleaning (operators/lines.py) vs pure-Python replicas.

Every operator is compared exactly against a replica implementing the
same published rule set (C4 line heuristics, CCNet/RefinedWeb
shared-line dedup), and the narrow ops are plan-pinned to zero
exchanges / zero Python nodes.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.lines import (
    BLOCK_SUBSTRINGS,
    boilerplate_line_stats,
    clean_lines,
    dedup_lines_within_doc,
    remove_boilerplate_lines,
)

BANNER = "This site uses tracking pixels on every page."
FOOTER = "Copyright 2024 Example Corp, all rights reserved."

DOCS = [
    (0, f"{BANNER}\nThe first real paragraph of document zero.\n{FOOTER}"),
    (1, f"{BANNER}\nDocument one has its own content here.\n{FOOTER}"),
    (2, f"{BANNER}\nA third document with unique body text.\n{FOOTER}"),
    (3, f"{BANNER}\nshort\nThe fourth document body line.\n{FOOTER}"),
    (4, "No banner here at all.\nJust two honest lines of prose."),
    (
        5,
        "Repeated paragraph inside one doc.\nRepeated paragraph inside one doc.\n"
        "A distinct closing line.",
    ),
]


def _lines(text: str) -> list[str]:
    return [l.strip() for l in text.split("\n") if l.strip()]


def _replica_clean(
    text: str, min_words: int = 3, punct: bool = False
) -> tuple[str, int]:
    kept = []
    for l in _lines(text):
        words = [w for w in l.split(" ") if w]
        ok = len(words) >= min_words
        if punct:
            ok = ok and l[-1:] in list('.!?"') + ["。", "！", "？", "」"]
        ok = ok and not any(s in l.lower() for s in BLOCK_SUBSTRINGS)
        if ok:
            kept.append(l)
    return "\n".join(kept), len(_lines(text)) - len(kept)


def _replica_df(
    docs: list[tuple[int, str]], min_chars: int = 15
) -> dict[str, int]:
    df: dict[str, int] = {}
    for _, text in docs:
        for l in set(l for l in _lines(text) if len(l) >= min_chars):
            h = hashlib.md5(l.encode()).hexdigest()
            df[h] = df.get(h, 0) + 1
    return df


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_clean_lines_matches_replica(spark, docs):
    got = {r.doc_id: (r.text, r.n_lines_dropped) for r in clean_lines(docs).collect()}
    for doc_id, text in DOCS:
        want_text, want_dropped = _replica_clean(text)
        if not want_text:
            assert doc_id not in got
        else:
            assert got[doc_id] == (want_text, want_dropped), doc_id


def test_clean_lines_terminal_punct(spark):
    df = spark.createDataFrame(
        [(0, "A proper sentence ends here.\nA trailing fragment without end")],
        "doc_id bigint, text string",
    )
    out = clean_lines(df, require_terminal_punct=True).collect()[0]
    assert out.text == "A proper sentence ends here."
    assert out.n_lines_dropped == 1


def test_clean_lines_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "{ json blob }"), (1, "Real content line here.")],
        "doc_id bigint, text string",
    )
    assert [r.doc_id for r in clean_lines(df).collect()] == [1]


def test_dedup_lines_within_doc(spark, docs):
    got = {r.doc_id: r.text for r in dedup_lines_within_doc(docs).collect()}
    assert got[5] == (
        "Repeated paragraph inside one doc.\nA distinct closing line."
    )
    # docs without internal repeats round-trip (modulo trim/empty-drop)
    assert got[4] == DOCS[4][1]


def test_boilerplate_stats_match_replica(spark, docs):
    got = {r.line_hash: r.df for r in boilerplate_line_stats(docs).collect()}
    assert got == _replica_df(DOCS)
    # the repeated in-doc line of doc 5 counts ONCE (document frequency)
    h = hashlib.md5(b"Repeated paragraph inside one doc.").hexdigest()
    assert got[h] == 1


def test_remove_boilerplate_lines(spark, docs):
    out = {
        r.doc_id: (r.text, r.n_boilerplate_dropped)
        for r in remove_boilerplate_lines(docs, max_doc_freq=3).collect()
    }
    # banner df=4 > 3 -> removed everywhere; footer df=4 -> removed
    assert out[0] == ("The first real paragraph of document zero.", 2)
    # 'short' is under min_line_chars -> immune even if frequent
    assert out[3][0] == "short\nThe fourth document body line."
    assert out[4] == (DOCS[4][1], 0)


def test_remove_boilerplate_no_hot_set_is_identity(spark, docs):
    out = remove_boilerplate_lines(docs, max_doc_freq=100)
    rows = {r.doc_id: (r.text, r.n_boilerplate_dropped) for r in out.collect()}
    assert all(n == 0 for _, n in rows.values())
    assert rows[4][0] == DOCS[4][1]


def test_remove_boilerplate_reuses_precomputed_stats(spark, docs):
    stats = boilerplate_line_stats(docs)
    a = remove_boilerplate_lines(docs, max_doc_freq=3).collect()
    b = remove_boilerplate_lines(docs, max_doc_freq=3, stats=stats).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hot_set_guard(spark, docs, monkeypatch):
    import jobcan_data_integrator_spark.operators.lines as mod

    monkeypatch.setattr(mod, "_MAX_HOT_LINES", 1)
    with pytest.raises(ValueError, match="hot set exceeds"):
        remove_boilerplate_lines(docs, max_doc_freq=3)


def test_narrow_ops_plan_shape(spark, docs):
    for frame in (
        clean_lines(docs),
        dedup_lines_within_doc(docs),
        remove_boilerplate_lines(docs, max_doc_freq=3),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert bad not in plan, plan


def test_stats_plan_single_aggregation(spark, docs):
    plan = (
        boilerplate_line_stats(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one exchange: the hash groupBy (map-side partials before it)
    assert plan.count("Exchange") == 1, plan


def test_full_pipeline_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    cleaned = remove_boilerplate_lines(
        dedup_lines_within_doc(clean_lines(docs, min_words=1)),
        max_doc_freq=50,
    )
    n_in, n_out = docs.count(), cleaned.count()
    assert 0 < n_out <= n_in
