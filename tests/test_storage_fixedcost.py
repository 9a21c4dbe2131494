"""Focused tests for the r11 fixed-cost storage optimizations:

1. Background submission inside a top-level ``begin_commit``/
   ``end_commit`` bracket (``_in_commit``): submits overlap on the
   scheduler but the bracket's semantics are unchanged — same-instance
   reads observe the pending writes, nothing publishes before
   ``end_commit``, a failing op aborts the bracket, and cross-table
   hazards stay ordered.
2. The versioned-dir schema memo (``_read_pq``): repeated reads of one
   immutable snapshot dir reuse the inferred schema; a new version with
   a DIFFERENT schema is read with its own schema (no stale memo).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.storage import TableStore


def _store(spark, tmp_path, **kw):
    return TableStore(
        spark, tmp_path / "store", snapshot_isolation=True,
        write_partitions=1, **kw,
    )


def test_begin_commit_backgrounds_submits(spark, tmp_path):
    store = _store(spark, tmp_path)
    a = spark.range(5).select(F.col("id").alias("k"))
    b = spark.range(7).select(F.col("id").alias("k"))
    store.begin_commit("bg-bracket", ["ta", "tb"])
    assert store._in_commit
    store.submit_op(lambda: store.overwrite("ta", a), reads=("ta",), writes=("ta",))
    store.submit_op(lambda: store.overwrite("tb", b), reads=("tb",), writes=("tb",))
    # the scheduler was engaged (not inline): at least one async future
    assert store._async is not None
    # same-instance reads barrier on the pending writer and see the data
    assert store.read("ta").count() == 5
    # a SECOND store instance (reader) must not see anything pre-publish
    other = TableStore(spark, tmp_path / "store", snapshot_isolation=True)
    assert not other.exists("ta")
    store.end_commit()
    assert not store._in_commit
    other2 = TableStore(spark, tmp_path / "store", snapshot_isolation=True)
    assert other2.read("ta").count() == 5
    assert other2.read("tb").count() == 7


def test_begin_commit_background_failure_aborts(spark, tmp_path):
    store = _store(spark, tmp_path)

    def boom():
        raise RuntimeError("background write failed")

    store.begin_commit("bg-fail", ["ta"])
    store.submit_op(boom, reads=("ta",), writes=("ta",))
    with pytest.raises(RuntimeError, match="background write failed"):
        store.end_commit()


def test_begin_commit_same_table_order_preserved(spark, tmp_path):
    """WAW: two background writes of one table land in submit order."""
    store = _store(spark, tmp_path)
    first = spark.range(3).select(F.col("id").alias("k"))
    second = spark.range(10).select(F.col("id").alias("k"))
    store.begin_commit("bg-waw", ["ta"])
    store.submit_op(lambda: store.overwrite("ta", first), reads=("ta",), writes=("ta",))
    store.submit_op(lambda: store.overwrite("ta", second), reads=("ta",), writes=("ta",))
    store.end_commit()
    assert store.read("ta").count() == 10


def test_schema_memo_hits_and_versions(spark, tmp_path):
    store = _store(spark, tmp_path)
    v1 = spark.range(4).select(F.col("id").alias("k"), F.lit("x").alias("s"))
    store.begin_commit("memo-1", ["tm"])
    store.overwrite("tm", v1)
    store.end_commit()
    r1 = store.read("tm")
    assert len(store._schema_memo) == 1
    # second read of the same version: memo hit, identical schema + rows
    r2 = store.read("tm")
    assert r2.schema == r1.schema
    assert sorted(r.k for r in r2.collect()) == [0, 1, 2, 3]
    # overwrite with a DIFFERENT schema -> new versioned dir -> no stale
    # schema served
    v2 = spark.range(2).select(
        F.col("id").alias("k"), F.lit(1).alias("n"), F.lit(True).alias("b")
    )
    store.begin_commit("memo-2", ["tm"])
    store.overwrite("tm", v2)
    store.end_commit()
    r3 = store.read("tm")
    assert set(r3.columns) == {"k", "n", "b"}
    assert r3.count() == 2


def test_driver_bounded_write_roundtrip(spark, tmp_path):
    """driver_bounded tables: the pyarrow driver-side write publishes a
    file Spark reads back with the IDENTICAL schema and rows the Spark
    writer would have produced; over-bound frames fall back silently."""
    rows = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("txt"),
        F.array(F.col("id"), F.col("id") * 2).alias("arr"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    store = _store(
        spark, tmp_path, driver_bounded={"tiny": 1000, "overcap": 10},
        sorted_by={"tiny": ["doc_id"]},
    )
    ctl = TableStore(
        spark, tmp_path / "ctl", snapshot_isolation=True, write_partitions=1
    )
    store.begin_commit("dw", ["tiny", "overcap", "empty"])
    store.overwrite("tiny", rows)
    store.overwrite("overcap", rows)  # 50 > 10: Spark-write fallback
    store.overwrite("empty", rows.filter("doc_id < 0"))
    store.end_commit()
    ctl.begin_commit("dw", ["tiny"])
    ctl.overwrite("tiny", rows)
    ctl.end_commit()
    a, b = store.read("tiny"), ctl.read("tiny")
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert store.read("overcap").count() == 50
    e = store.read("empty")
    assert e.count() == 0 and e.schema == b.schema
    # the fast path actually engaged (and only where contracted)
    droot = tmp_path / "store"
    assert list(droot.glob("tiny.v-*/part-00000-driver.parquet"))
    assert not list(droot.glob("overcap.v-*/part-*driver*.parquet"))


def test_driver_bounded_merge_rides_overwrite(spark, tmp_path):
    """merge_upsert / merge_insert_missing on an unmanaged bounded table
    go through the driver-side write and keep merge semantics exact."""
    store = _store(spark, tmp_path, driver_bounded={"m": 1000})
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("old").alias("v")
    )
    ups = spark.range(5, 15).select(
        F.col("id").alias("k"), F.lit("new").alias("v")
    )
    store.begin_commit("m1", ["m"])
    store.overwrite("m", base)
    store.merge_upsert("m", ups, ["k"])
    store.end_commit()
    got = {(r.k, r.v) for r in store.read("m").collect()}
    assert got == {(k, "old") for k in range(5)} | {
        (k, "new") for k in range(5, 15)
    }
    store.begin_commit("m2", ["m"])
    store.merge_insert_missing(
        "m",
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.lit("ins").alias("v")
        ),
        ["k"],
    )
    store.end_commit()
    got = {(r.k, r.v) for r in store.read("m").collect()}
    assert got == {(k, "old") for k in range(5)} | {
        (k, "new") for k in range(5, 15)
    } | {(k, "ins") for k in range(15, 20)}


def test_abort_commit_clears_failed_bracket(spark, tmp_path):
    """An exception inside a standalone bracket must not leave pending
    background writes that a LATER unrelated commit would publish."""
    store = _store(spark, tmp_path)
    good = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(RuntimeError, match="boom"):
        with store.commit_bracket("bad", ["ta"]):
            store.submit_op(
                lambda: store.overwrite("ta", good),
                reads=("ta",), writes=("ta",),
            )
            raise RuntimeError("boom")
    assert not store._in_commit
    assert not store._pending_versions
    # the failed bracket's write never became visible, and a fresh
    # bracket works normally
    assert not store.exists("ta")
    with store.commit_bracket("ok", ["tb"]):
        store.overwrite("tb", good)
    assert store.read("tb").count() == 3
    assert not store.exists("ta")


def test_commit_bracket_background_failure_aborts(spark, tmp_path):
    """A background write failure surfaces at the bracket exit AND the
    bracket aborts (no half-published state)."""
    store = _store(spark, tmp_path)

    def boom():
        raise ValueError("bg fail")

    with pytest.raises(ValueError, match="bg fail"):
        with store.commit_bracket("bg-bad", ["ta"]):
            store.submit_op(boom, reads=("ta",), writes=("ta",))
    assert not store._in_commit
    assert not store._pending_versions
