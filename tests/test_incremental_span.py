"""Incremental span-level ExactSubstr dedup (operators/incremental.py's
7th index family: sp_occs / sp_hashes / sp_flags).

The load-bearing property: for ANY split of the corpus into
corpus + increment,

    full_corpus_flag_set ≡ stored_flags ∪ span_increment(increment).flags

— including RETROACTIVE flags (an increment introducing an earlier
(doc_id, pos) demotes the corpus's old first occurrence), and
idempotently under batch replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.dedup import duplicate_span_intervals
from jobcan_data_integrator_spark.operators.incremental import (
    SPAN_TABLES,
    build_span_index,
    extend_span_index,
    span_increment,
    span_index_buckets,
)
from jobcan_data_integrator_spark.storage import TableStore

SPAN = 4


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(df):
    return {(r["doc_id"], r["pos"]) for r in df.collect()}


def _full_flags(spark, docs):
    """Reference: the full-corpus flagged occurrence set, derived from
    the batch operator's internals (non-first occurrences)."""
    from jobcan_data_integrator_spark.operators.incremental import (
        _span_flags,
        _span_hash_groups,
        _span_occ_rows,
    )

    occ = _span_occ_rows(docs, SPAN)
    return _flags(_span_flags(occ, _span_hash_groups(occ)))


_ROWS = [
    (0, "a b c d x1 x2"),
    (1, "x3 a b c d x4"),          # repeats doc 0's run
    (2, "p q r s t u"),
    (3, "p q r s x5 x6"),          # repeats doc 2's prefix
    (4, "m n o w1 w2 w3"),
    (5, "a b c d p q r s"),        # repeats both runs
]


def test_split_equals_full_corpus(spark, tmp_path):
    docs = _mk(spark, _ROWS)
    full = _full_flags(spark, docs)
    assert full  # fixture actually has duplicated spans

    store = TableStore(spark, tmp_path, write_partitions=2)
    build_span_index(store, docs.filter(F.col("doc_id") <= 3), span=SPAN)
    _, flags = span_increment(store, docs.filter(F.col("doc_id") > 3), span=SPAN)
    combined = _flags(store.read("sp_flags")) | _flags(flags)
    assert combined == full
    for t in SPAN_TABLES:
        assert store.exists(t)


def test_retroactive_flag_when_increment_has_earlier_key(spark, tmp_path):
    # corpus = docs 4,5; increment = docs 0..3 with SMALLER ids: doc 5's
    # copies of "a b c d" / "p q r s" were first in the corpus-only
    # view, but the increment's doc 0 / doc 2 now hold the global first
    # occurrences — doc 5 must be retro-flagged by the increment.
    docs = _mk(spark, _ROWS)
    full = _full_flags(spark, docs)

    store = TableStore(spark, tmp_path, write_partitions=2)
    build_span_index(store, docs.filter(F.col("doc_id") >= 4), span=SPAN)
    assert _flags(store.read("sp_flags")) == set()  # nothing duplicated yet
    _, flags = span_increment(store, docs.filter(F.col("doc_id") < 4), span=SPAN)
    got = _flags(flags)
    assert (5, 0) in got and (5, 4) in got  # the retro demotions
    assert _flags(store.read("sp_flags")) | got == full


def test_extend_then_replay_converges(spark, tmp_path):
    docs = _mk(spark, _ROWS)
    full = _full_flags(spark, docs)

    store = TableStore(
        spark, tmp_path, write_partitions=2, bucketed=span_index_buckets(4)
    )
    build_span_index(store, docs.filter(F.col("doc_id") <= 2), span=SPAN)
    inc_docs = docs.filter(F.col("doc_id") > 2)
    groups, flags = span_increment(store, inc_docs, span=SPAN)
    extend_span_index(store, inc_docs, groups, flags, span=SPAN)
    assert _flags(store.read("sp_flags")) == full

    # replay the same batch (crash-after-commit redelivery): pure
    # recompute + keyed merges must not change anything
    groups2, flags2 = span_increment(store, inc_docs, span=SPAN)
    extend_span_index(store, inc_docs, groups2, flags2, span=SPAN)
    assert _flags(store.read("sp_flags")) == full
    occ = store.read("sp_occs")
    assert occ.count() == occ.dropDuplicates(["doc_id", "pos"]).count()
    # hash stats stayed consistent with a from-scratch build
    n = {r["h"]: (r["n_occ"], r["min_key"]) for r in store.read("sp_hashes").collect()}
    fresh = TableStore(spark, tmp_path / "fresh", write_partitions=2)
    build_span_index(fresh, docs, span=SPAN)
    m = {r["h"]: (r["n_occ"], r["min_key"]) for r in fresh.read("sp_hashes").collect()}
    affected = {h for h in n if h in m}
    assert all(n[h] == m[h] for h in affected)


def test_flags_drive_the_same_intervals_as_the_batch_operator(spark, tmp_path):
    # composing index flags with the gaps-and-islands merge reproduces
    # the batch operator's removal intervals
    docs = _mk(spark, _ROWS)
    batch = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_span_intervals(docs, span=SPAN).collect()
    }
    store = TableStore(spark, tmp_path, write_partitions=2)
    build_span_index(store, docs, span=SPAN)
    flags = store.read("sp_flags")
    from pyspark.sql.window import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    brk = (
        F.when(
            F.col("pos")
            <= F.coalesce(F.max(F.col("pos") + SPAN - 1).over(w_prev), F.lit(-2)) + 1,
            0,
        ).otherwise(1)
    )
    got = {
        (r["doc_id"], r["s"], r["e"])
        for r in flags.withColumn("_brk", brk)
        .withColumn("_i", F.sum("_brk").over(w_run))
        .groupBy("doc_id", "_i")
        .agg(F.min("pos").alias("s"), (F.max("pos") + SPAN - 1).alias("e"))
        .collect()
    }
    assert got == batch
