"""Incremental n-gram LM index (operators/incremental.py's 8th family:
lm_uni / lm_bi / lm_tri / lm_tot / lm_batches).

Load-bearing properties:

- probe equivalence: ``perplexity_increment`` over a bucket-pruned store
  == ``perplexity`` against the full in-memory LM;
- extend equivalence: build(half A) + extend(half B) leaves tables and
  totals identical to train(A ∪ B) — the corpus-additivity of counts,
  now through the storage layer;
- exactly-once: a REDELIVERED batch_id is skipped (additive merges must
  not double-add), and a plain-mode store is rejected outright.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.incremental import (
    build_lm_index,
    extend_lm_index,
    lm_from_store,
    lm_index_buckets,
    perplexity_increment,
)
from jobcan_data_integrator_spark.operators.lm import perplexity, train_ngram_lm
from jobcan_data_integrator_spark.storage import TableStore

_CORPUS = [
    (0, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (4, "a cat and a dog met"),
    (6, "the mat sat on the cat"),
]
_NEW = [
    (1, "the cat sat on the log"),
    (3, "the zebra sat quietly today"),
    (5, "my dog sat on a mat"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def snap_store(spark, tmp_path):
    return TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        bucketed=lm_index_buckets(4),
        snapshot_isolation=True,
    )


def test_pruned_probe_equals_full_lm_scoring(spark, snap_store):
    build_lm_index(snap_store, _mk(spark, _CORPUS))
    new = _mk(spark, _NEW)
    got = _rows(perplexity_increment(snap_store, new))
    want = _rows(perplexity(new, train_ngram_lm(_mk(spark, _CORPUS))))
    assert got == want and len(got) == len(_NEW)


def test_extend_matches_full_retrain(spark, snap_store):
    build_lm_index(snap_store, _mk(spark, _CORPUS))
    extend_lm_index(snap_store, _mk(spark, _NEW), "b1")
    full = train_ngram_lm(_mk(spark, _CORPUS + _NEW))
    stored = lm_from_store(snap_store)
    for part in ("uni", "bi", "tri", "totals"):
        assert _rows(getattr(stored, part)) == _rows(getattr(full, part)), part
    # and the extended index scores a probe exactly like the retrain
    probe = _mk(spark, [(9, "the cat sat on a log today")])
    assert _rows(perplexity_increment(snap_store, probe)) == _rows(
        perplexity(probe, full)
    )


def test_redelivered_batch_is_skipped(spark, snap_store):
    build_lm_index(snap_store, _mk(spark, _CORPUS))
    extend_lm_index(snap_store, _mk(spark, _NEW), "b1")
    before = {p: _rows(getattr(lm_from_store(snap_store), p)) for p in ("uni", "tri", "totals")}
    extend_lm_index(snap_store, _mk(spark, _NEW), "b1")  # redelivery
    after = {p: _rows(getattr(lm_from_store(snap_store), p)) for p in ("uni", "tri", "totals")}
    assert before == after


def test_plain_store_is_rejected(spark, tmp_path):
    plain = TableStore(spark, tmp_path, write_partitions=2)
    build_lm_index(plain, _mk(spark, _CORPUS))
    with pytest.raises(ValueError, match="snapshot-isolation"):
        extend_lm_index(plain, _mk(spark, _NEW), "b1")


def test_unbucketed_snapshot_store_still_correct(spark, tmp_path):
    """Bucketing is an optimization: without it, probes fall back to
    full reads with identical results."""
    store = TableStore(
        spark, tmp_path, write_partitions=2, snapshot_isolation=True
    )
    build_lm_index(store, _mk(spark, _CORPUS))
    extend_lm_index(store, _mk(spark, _NEW), "b1")
    probe = _mk(spark, [(9, "the cat sat on a log today")])
    full = train_ngram_lm(_mk(spark, _CORPUS + _NEW))
    assert _rows(perplexity_increment(store, probe)) == _rows(
        perplexity(probe, full)
    )
