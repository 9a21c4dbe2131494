"""Incremental boilerplate line-stats index (operators/incremental.py's
9th family: bl_stats / bl_batches).

Load-bearing properties:

- probe equivalence: ``clean_increment`` over a bucket-pruned store ==
  ``remove_boilerplate_lines`` over (stored corpus ∪ increment)
  restricted to the increment's docs;
- extend equivalence: build(half A) + extend(half B) leaves bl_stats
  identical to one full-corpus stats pass — df counts are
  corpus-additive through the storage layer;
- exactly-once: a redelivered batch_id is a no-op, plain-mode stores
  are rejected (additive merges don't replay safely without snapshot
  isolation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.incremental import (
    build_line_index,
    clean_increment,
    extend_line_index,
    line_index_buckets,
)
from jobcan_data_integrator_spark.operators.lines import (
    boilerplate_line_stats,
    remove_boilerplate_lines,
)
from jobcan_data_integrator_spark.storage import TableStore

BANNER = "This corpus-wide banner appears in most documents."

_CORPUS = [
    (0, f"{BANNER}\nBody paragraph of the zeroth document."),
    (2, f"{BANNER}\nSecond document body, different text."),
    (4, f"{BANNER}\nA third body, also unique content."),
    (6, "A document without the banner at all."),
]
_NEW = [
    (1, f"{BANNER}\nFresh increment document number one."),
    (3, f"{BANNER}\nAnother fresh increment, number three."),
    (5, "Increment doc without any shared lines."),
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
        bucketed=line_index_buckets(4),
        snapshot_isolation=True,
    )


def test_clean_increment_equals_full_corpus_clean(spark, snap_store):
    build_line_index(snap_store, _mk(spark, _CORPUS))
    new = _mk(spark, _NEW)
    # banner df: 3 stored + 2 increment = 5 > 4 -> removed from the
    # increment even though neither half alone crosses the cap
    got = _rows(clean_increment(snap_store, new, max_doc_freq=4))
    full = remove_boilerplate_lines(
        _mk(spark, _CORPUS + _NEW), max_doc_freq=4
    ).filter(F.col("doc_id").isin([d for d, _ in _NEW]))
    assert got == _rows(full) and len(got) == len(_NEW)
    dropped = {r[0]: r[2] for r in got}
    assert dropped == {1: 1, 3: 1, 5: 0}


def test_clean_increment_corpus_stats_only(spark, snap_store):
    build_line_index(snap_store, _mk(spark, _CORPUS))
    # stored df alone is 3 <= 4 -> with include_increment=False the
    # banner survives at cap 4 but not at cap 2
    new = _mk(spark, _NEW)
    keep = clean_increment(
        snap_store, new, max_doc_freq=4, include_increment=False
    )
    assert all(r.n_boilerplate_dropped == 0 for r in keep.collect())
    drop = clean_increment(
        snap_store, new, max_doc_freq=2, include_increment=False
    )
    assert {r.doc_id: r.n_boilerplate_dropped for r in drop.collect()} == {
        1: 1,
        3: 1,
        5: 0,
    }


def test_extend_matches_full_stats_pass(spark, snap_store):
    build_line_index(snap_store, _mk(spark, _CORPUS))
    extend_line_index(snap_store, _mk(spark, _NEW), "b1")
    want = _rows(boilerplate_line_stats(_mk(spark, _CORPUS + _NEW)))
    assert _rows(snap_store.read("bl_stats")) == want


def test_redelivered_batch_is_noop(spark, snap_store):
    build_line_index(snap_store, _mk(spark, _CORPUS))
    extend_line_index(snap_store, _mk(spark, _NEW), "b1")
    before = _rows(snap_store.read("bl_stats"))
    extend_line_index(snap_store, _mk(spark, _NEW), "b1")  # redelivery
    assert _rows(snap_store.read("bl_stats")) == before


def test_plain_store_rejected(spark, tmp_path):
    plain = TableStore(spark, tmp_path, write_partitions=2)
    build_line_index(plain, _mk(spark, _CORPUS))
    with pytest.raises(ValueError, match="snapshot-isolation"):
        extend_line_index(plain, _mk(spark, _NEW), "b1")


def test_probe_is_bucket_pruned(spark, snap_store):
    """The stored-side read must scan only the increment's buckets."""
    build_line_index(snap_store, _mk(spark, _CORPUS))
    new = _mk(spark, [_NEW[2]])  # no shared lines -> tiny key set
    inc = boilerplate_line_stats(new)
    pruned = snap_store.read_for_keys(
        "bl_stats", inc.select("line_hash"), "line_hash"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "isin" in plan.lower(), plan
    # superset contract: pruned rows ⊆ full table
    assert set(map(tuple, pruned.collect())) <= set(
        map(tuple, snap_store.read("bl_stats").collect())
    )


def test_clean_documents_stream(spark, tmp_path):
    """Ingest-time line cleaning: two micro-batches; the accumulated
    stats equal one full-corpus pass, later batches are cleaned with
    the accumulated counts, and a FULL REPROCESS (fresh checkpoint over
    the same source) refines the cleaned table to exactly the one-shot
    full-corpus clean without double-adding any counts."""
    from jobcan_data_integrator_spark import streaming as S

    src = tmp_path / "doc_stream"
    _mk(spark, _CORPUS).coalesce(1).write.mode("append").parquet(str(src))
    _mk(spark, _NEW).coalesce(1).write.mode("append").parquet(str(src))

    def run(ck):
        store = TableStore(
            spark,
            tmp_path / "index",
            write_partitions=2,
            bucketed=line_index_buckets(4),
            snapshot_isolation=True,
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = S.clean_documents_stream(
            stream, store, str(tmp_path / ck), max_doc_freq=4
        ).start()
        q.awaitTermination()
        return store

    store = run("ck1")
    # (a) accumulated stats == one full-corpus stats pass
    assert _rows(store.read("bl_stats")) == _rows(
        boilerplate_line_stats(_mk(spark, _CORPUS + _NEW))
    )
    # (b) the SECOND batch was cleaned against corpus+batch counts:
    # banner df = 3 stored + 2 in-batch = 5 > 4 -> dropped
    cleaned = {
        r.doc_id: (r.text, r.n_boilerplate_dropped)
        for r in store.read("bl_clean_docs").collect()
    }
    want_new = remove_boilerplate_lines(
        _mk(spark, _CORPUS + _NEW), max_doc_freq=4
    ).filter(F.col("doc_id").isin([d for d, _ in _NEW]))
    for r in want_new.collect():
        assert cleaned[r.doc_id] == (r.text, r.n_boilerplate_dropped)
    # batch 1 saw only its own counts (banner df 3 <= 4 -> kept)
    assert cleaned[0][1] == 0

    # (c) FULL reprocess through a fresh checkpoint: counts must not
    # double-add, and every batch now cleans against the complete
    # stats — bl_clean_docs becomes exactly the one-shot corpus clean
    store = run("ck2")
    after = sorted(
        (r.doc_id, r.text, r.n_boilerplate_dropped)
        for r in store.read("bl_clean_docs").collect()
    )
    want_all = sorted(
        (r.doc_id, r.text, r.n_boilerplate_dropped)
        for r in remove_boilerplate_lines(
            _mk(spark, _CORPUS + _NEW), max_doc_freq=4
        ).collect()
    )
    assert after == want_all
    assert _rows(store.read("bl_stats")) == _rows(
        boilerplate_line_stats(_mk(spark, _CORPUS + _NEW))
    )
