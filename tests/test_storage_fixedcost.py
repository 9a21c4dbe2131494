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
