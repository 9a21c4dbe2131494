"""Reader-facing snapshot isolation (TableStore snapshot mode).

Plain mode's per-table swaps are individually atomic but a mid-batch
reader can see table A post-batch and table B pre-batch.  Snapshot mode
writes every table to a fresh versioned dir and publishes the whole
batch via ONE atomic manifest-pointer replace — a reader that pins a
snapshot observes a consistent table set, always.
"""

from __future__ import annotations

import threading

import pytest

from jobcan_data_integrator_spark.storage import TableStore


def _df(spark, v: int):
    return spark.createDataFrame([(v,)], "v long")


def _snap_store(spark, root) -> TableStore:
    return TableStore(spark, root, write_partitions=1, snapshot_isolation=True)


def test_mid_batch_reader_sees_pre_batch_pair(spark, tmp_path):
    w = _snap_store(spark, tmp_path)
    w.begin_commit("b0", ["ta", "tb"])
    w.overwrite("ta", _df(spark, 0))
    w.overwrite("tb", _df(spark, 0))
    w.end_commit()

    r = _snap_store(spark, tmp_path)
    # batch 1 in flight: A written, B not yet — the dangerous window
    w.begin_commit("b1", ["ta", "tb"])
    w.overwrite("ta", _df(spark, 1))
    snap = r.current_snapshot()
    pair = (
        r.read_at("ta", snap).collect()[0].v,
        r.read_at("tb", snap).collect()[0].v,
    )
    assert pair == (0, 0)  # never A-new/B-old
    # the writer reads its OWN pending write (read-your-own-writes)
    assert w.read("ta").collect()[0].v == 1

    w.overwrite("tb", _df(spark, 1))
    w.end_commit()
    snap2 = r.current_snapshot()
    assert snap2["version"] == snap["version"] + 1
    assert [r.read_at(t, snap2).collect()[0].v for t in ("ta", "tb")] == [1, 1]
    # a reader that pinned just before the publish can still finish its
    # scan: the previous snapshot's dirs survive one publish cycle
    assert r.read_at("ta", snap).collect()[0].v == 0


def test_concurrent_reader_never_sees_torn_batch(spark, tmp_path):
    w = _snap_store(spark, tmp_path)
    w.overwrite("ta", _df(spark, 0))
    w.overwrite("tb", _df(spark, 0))
    w.end_commit()

    r = _snap_store(spark, tmp_path)
    torn: list[tuple[int, int]] = []
    stop = threading.Event()

    def read_loop():
        while not stop.is_set():
            snap = r.current_snapshot()
            a = r.read_at("ta", snap).collect()[0].v
            b = r.read_at("tb", snap).collect()[0].v
            if a != b:
                torn.append((a, b))

    t = threading.Thread(target=read_loop)
    t.start()
    try:
        for v in range(1, 5):
            w.begin_commit(f"b{v}", ["ta", "tb"])
            w.overwrite("ta", _df(spark, v))
            w.overwrite("tb", _df(spark, v))
            w.end_commit()
    finally:
        stop.set()
        t.join()
    assert torn == []


def test_crash_before_publish_leaves_old_snapshot(spark, tmp_path):
    w = _snap_store(spark, tmp_path)
    w.begin_commit("b0", ["ta"])
    w.overwrite("ta", _df(spark, 0))
    w.end_commit()

    # simulate a crash mid-batch: versioned dir written, pointer never moved
    w.begin_commit("b1", ["ta"])
    w.overwrite("ta", _df(spark, 99))
    del w

    r = _snap_store(spark, tmp_path)
    assert r.read("ta").collect()[0].v == 0  # pre-batch state
    assert r.pending_commit()["batch_id"] == "b1"  # interrupted batch detected
    pre_replay_dir = r.current_snapshot()["tables"]["ta"]
    # the replay re-runs the batch and publishes; the abandoned dir is GC'd
    r.begin_commit("b1", ["ta"])
    r.overwrite("ta", _df(spark, 1))
    r.end_commit()
    assert r.read("ta").collect()[0].v == 1
    published_dir = r.current_snapshot()["tables"]["ta"]
    leftovers = {p.name for p in tmp_path.glob("ta.v-*")}
    # exactly: the published dir + the previous snapshot's dir (one-cycle
    # grace for in-flight pins); the crashed batch's dir is gone
    assert leftovers == {pre_replay_dir, published_dir}


def test_snapshot_mode_rejects_partitioned_tables(spark, tmp_path):
    with pytest.raises(ValueError, match="snapshot_isolation"):
        TableStore(
            spark,
            tmp_path,
            snapshot_isolation=True,
            bucketed={"t": ("k", 4)},
        )
