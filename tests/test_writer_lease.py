"""Single-writer enforcement (TableStore._acquire_lease): commits are
fenced by a PROCESS-scoped advisory lease so a second concurrent writer
process cannot interleave manifests or snapshot-pointer swaps
undetected.

The reference gets this for free from SQLite's file lock (one writer
per database); the parquet/snapshot backends documented the
single-writer stance but round 6 left it unenforced — these tests pin
the enforcement: live-foreign-process refusal (a REAL second process
holds the lease), same-process re-entrance (crash replay and the
supported in-process streaming+batch composition), dead-pid takeover
(a real exited process), TTL takeover (the cross-host backstop), and
release on both success and failure paths.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from jobcan_data_integrator_spark.storage import (
    ConcurrentWriterError,
    TableStore,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_live_foreign_writer_is_refused_then_takeover_on_death(
    spark, tmp_path
):
    """A REAL second process holds the lease: this process's commit is
    refused while it lives, and taken over once it exits — the
    cross-process scenario the lease exists for."""
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        (tmp_path / TableStore.LEASE).write_text(
            json.dumps({"pid": child.pid, "ts": time.time()})
        )
        b = TableStore(spark, tmp_path, snapshot_isolation=True)
        with pytest.raises(ConcurrentWriterError, match=str(child.pid)):
            b.begin_commit("batch-b", ["t"])
        with pytest.raises(ConcurrentWriterError):
            with b.batch_commit("batch-b", ["t"]):
                pass  # pragma: no cover - refused at entry
    finally:
        child.kill()
        child.wait()
    # the holder is dead: stale-lease takeover, no deadlock
    b.begin_commit("batch-b", ["t"])
    holder = json.loads((tmp_path / TableStore.LEASE).read_text())
    assert holder["pid"] == os.getpid()
    b.end_commit()
    assert not (tmp_path / TableStore.LEASE).exists()


def test_same_process_reenters_after_crash_and_composes(spark, tmp_path):
    """Same-process re-entrance: a writer that crashed between begin and
    end (manifest left in place) replays through a FRESH handle in the
    same process — and two handles sharing one root in one process (the
    supported streaming+batch composition) never fence each other."""
    a = TableStore(spark, tmp_path, snapshot_isolation=True)
    a.begin_commit("batch-a", ["t"])
    assert a.pending_commit()["batch_id"] == "batch-a"
    del a  # simulated same-process instance crash

    b = TableStore(spark, tmp_path, snapshot_isolation=True)
    b.begin_commit("batch-a", ["t"])  # replay: process-scoped, no error
    b.overwrite("t", _mk(spark, [(1, "x")]))
    b.end_commit()
    assert b.pending_commit() is None
    assert not (tmp_path / TableStore.LEASE).exists()


def test_expired_lease_is_taken_over_even_if_pid_alive(spark, tmp_path):
    """The TTL backstop: on a shared filesystem another HOST's writer
    has a locally-meaningless pid, so a lease past LEASE_TTL_SECONDS is
    stale regardless of apparent pid liveness.  (Uses pid 1 — always
    alive, never this process.)"""
    (tmp_path / TableStore.LEASE).write_text(
        json.dumps(
            {"pid": 1, "ts": time.time() - TableStore.LEASE_TTL_SECONDS - 60}
        )
    )
    b = TableStore(spark, tmp_path, snapshot_isolation=True)
    b.begin_commit("recover", ["t"])
    b.end_commit()


def test_fresh_foreign_lease_with_live_pid_blocks(spark, tmp_path):
    """A fresh lease held by a live pid that is not ours blocks (pid 1
    is always alive): the refusal path, without a subprocess."""
    (tmp_path / TableStore.LEASE).write_text(
        json.dumps({"pid": 1, "ts": time.time()})
    )
    b = TableStore(spark, tmp_path, snapshot_isolation=True)
    with pytest.raises(ConcurrentWriterError, match="pid 1"):
        b.begin_commit("blocked", ["t"])


def test_batch_commit_failure_releases_lease(spark, tmp_path):
    a = TableStore(spark, tmp_path, snapshot_isolation=True)
    with pytest.raises(RuntimeError, match="boom"):
        with a.batch_commit("batch-a", ["t"]):
            raise RuntimeError("boom")
    # manifest stays (the interrupted batch is detectable) but the
    # lease is gone — this writer is no longer mid-swap
    assert a.pending_commit()["batch_id"] == "batch-a"
    assert not (tmp_path / TableStore.LEASE).exists()


def test_torn_lease_file_is_reclaimed(spark, tmp_path):
    (tmp_path / TableStore.LEASE).write_text("{half a jso")
    b = TableStore(spark, tmp_path, snapshot_isolation=True)
    b.begin_commit("recover", ["t"])
    b.end_commit()


def test_readers_never_take_the_lease(spark, tmp_path):
    a = TableStore(spark, tmp_path, snapshot_isolation=True)
    a.begin_commit("w", ["t"])
    a.overwrite("t", _mk(spark, [(1, "x")]))
    a.end_commit()
    # a foreign writer's fresh lease is in place; reads stay unfenced
    (tmp_path / TableStore.LEASE).write_text(
        json.dumps({"pid": 1, "ts": time.time()})
    )
    b = TableStore(spark, tmp_path, snapshot_isolation=True)
    assert b.read("t").count() == 1
