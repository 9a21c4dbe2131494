"""Span-level exact-substring dedup (operators/dedup.py: the Lee et al.
2021 ExactSubstr pass, fixed-span-hash approximation).

Crafted fixtures pin the semantics the corpus gate can't isolate:
first-occurrence survival, overlapping-window interval merge, the
no-duplicate identity path, and the text-removal materialization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.dedup import (
    duplicate_span_intervals,
    remove_duplicate_spans,
    span_dedup_summary,
)

W = "w{}"  # unique filler tokens


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(*idx):
    return " ".join(W.format(i) for i in idx)


def test_first_occurrence_survives_and_second_is_removed(spark):
    # doc 0 and doc 1 share one exact 4-token run; doc 0 has the global
    # first occurrence, so only doc 1 gets an interval
    shared = "a b c d"
    docs = _mk(
        spark,
        [
            (0, _words(1, 2) + " " + shared + " " + _words(3, 4)),
            (1, _words(5, 6, 7) + " " + shared + " " + _words(8)),
        ],
    )
    ivs = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_span_intervals(docs, span=4).collect()
    }
    assert ivs == {(1, 3, 6)}


def test_overlapping_windows_merge_into_one_interval(spark):
    # doc 1 repeats a 6-token run of doc 0: with span=4 the run yields 3
    # overlapping duplicated windows (starts 0,1,2) that must merge into
    # ONE interval covering tokens 0..5 — and removal counts 6, not 12
    run = "a b c d e f"
    docs = _mk(
        spark,
        [(0, run + " " + _words(1, 2)), (1, run + " " + _words(3, 4))],
    )
    ivs = [
        (r["start_tok"], r["end_tok"])
        for r in duplicate_span_intervals(docs, span=4)
        .filter(F.col("doc_id") == 1)
        .collect()
    ]
    assert ivs == [(0, 5)]
    summary = {
        r["doc_id"]: (r["n_dup_spans"], r["n_removed_tokens"], r["n_kept_tokens"])
        for r in span_dedup_summary(docs, span=4).collect()
    }
    assert summary[1] == (3, 6, 2)
    assert summary[0] == (0, 0, 8)


def test_within_document_repetition_is_deduped(spark):
    # one doc repeating its own 4-token run: the first occurrence
    # survives, the second is removed — self-repetition counts
    run = "a b c d"
    docs = _mk(spark, [(7, run + " " + _words(1) + " " + run)])
    ivs = [
        (r["start_tok"], r["end_tok"])
        for r in duplicate_span_intervals(docs, span=4).collect()
    ]
    assert ivs == [(5, 8)]


def test_no_duplicates_is_identity(spark):
    docs = _mk(spark, [(0, _words(1, 2, 3, 4, 5)), (1, _words(6, 7, 8, 9))])
    assert duplicate_span_intervals(docs, span=4).count() == 0
    out = {r["doc_id"]: r for r in span_dedup_summary(docs, span=4).collect()}
    assert out[0]["n_removed_tokens"] == 0
    assert out[0]["n_kept_tokens"] == 5
    assert out[0]["dup_count"] == 1


def test_exact_dup_docs_fold_into_group_facts(spark):
    docs = _mk(spark, [(3, "x y"), (9, "x y"), (5, "z q")])
    out = {r["doc_id"]: r for r in span_dedup_summary(docs, span=4).collect()}
    assert out[3]["keep_doc_id"] == 3 and out[3]["dup_count"] == 2
    assert out[9]["keep_doc_id"] == 3 and out[9]["dup_count"] == 2
    assert out[5]["keep_doc_id"] == 5 and out[5]["dup_count"] == 1


def test_remove_duplicate_spans_materializes_cleaned_text(spark):
    run = "a b c d"
    keep_tail = _words(8)
    docs = _mk(
        spark,
        [
            (0, _words(1, 2) + " " + run),
            (1, run + " " + keep_tail),
        ],
    )
    out = {r["doc_id"]: r["deduped_text"] for r in
           remove_duplicate_spans(docs, span=4).collect()}
    assert out[0] == _words(1, 2) + " " + run  # first occurrence untouched
    assert out[1] == keep_tail


def test_short_documents_pass_through(spark):
    docs = _mk(spark, [(0, "a b"), (1, "a b")])  # below span length
    assert duplicate_span_intervals(docs, span=4).count() == 0
    out = {r["doc_id"]: r for r in span_dedup_summary(docs, span=4).collect()}
    # doc-level dedup still sees them as an exact-dup group
    assert out[1]["keep_doc_id"] == 0
    assert out[1]["n_kept_tokens"] == 2


def test_semantic_pairs_match_dedup_internal_pairs(spark):
    """semantic_near_dup_pairs (the gate-facing pair view) and
    semantic_dedup (the label view) must agree on the duplicate graph:
    every non-keep label is reachable from some pair."""
    from jobcan_data_integrator_spark.operators.similarity import (
        semantic_dedup,
        semantic_near_dup_pairs,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    pairs = semantic_near_dup_pairs(emb, n_cells=8, iters=1, threshold=0.3)
    labels = semantic_dedup(emb, n_cells=8, iters=1, threshold=0.3)
    paired_ids = {
        v
        for r in pairs.collect()
        for v in (r["vec_a"], r["vec_b"])
    }
    dropped = {r["vec_id"] for r in labels.collect() if not r["keep"]}
    assert dropped <= paired_ids
    assert len(paired_ids) > 0 and len(dropped) > 0
