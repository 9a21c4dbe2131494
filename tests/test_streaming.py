"""Streaming-mode tests: bronze-tail -> silver merge (batch/stream shared
write path), watermarked windowed aggregation, and the custom stateful
sessionizer.  File sources + memory sinks; availableNow triggers so each
test drains deterministically."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from jobcan_fixtures import make_request_docs
from jobcan_data_integrator_spark.storage import TableStore
from jobcan_data_integrator_spark import streaming as S


def _write_jsonl(path: Path, docs: list[dict]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(d, ensure_ascii=False) for d in docs))


@pytest.fixture()
def bronze(tmp_path):
    return tmp_path / "bronze" / "requests_detail"


def test_stream_merge_maintains_silver(spark, tmp_path, bronze):
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    docs = [json.loads(d) for d in make_request_docs(8)]
    _write_jsonl(bronze / "batch-0.json", docs[:5])
    store = TableStore(spark, tmp_path / "silver", write_partitions=1)

    stream = S.stream_bronze_documents(spark, str(bronze))
    assert stream.isStreaming
    q = S.merge_documents_stream(stream, store, str(tmp_path / "ckpt")).start()
    q.awaitTermination()
    assert store.read("requests").count() == 5

    # micro-batch 2: 3 new docs + 1 update (shorter children list)
    upd = json.loads(json.dumps(docs[0]))
    upd["title"] = "stream更新"
    upd["detail"]["customized_items"] = upd["detail"]["customized_items"][:1]
    _write_jsonl(bronze / "batch-1.json", docs[5:] + [upd])
    q = S.merge_documents_stream(stream, store, str(tmp_path / "ckpt")).start()
    q.awaitTermination()
    assert store.read("requests").count() == 8
    got = store.read("requests").where("id = 'sa-0'").collect()[0]
    assert got["title"] == "stream更新"
    assert (
        store.read("customized_items").where("request_id = 'sa-0'").count() == 1
    )


def test_windowed_counts_with_watermark(spark, tmp_path, bronze):
    docs = [json.loads(d) for d in make_request_docs(12)]
    _write_jsonl(bronze / "b0.json", docs)
    stream = S.stream_bronze_documents(spark, str(bronze))
    counts = S.windowed_request_counts(stream, window="1 day", watermark="2 days")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .start()
    )
    q.awaitTermination()
    # append mode emits only windows closed by the watermark; with a single
    # batch nothing closes — assert the aggregation itself on a batch frame
    batch = S.windowed_request_counts(
        __import__(
            "jobcan_data_integrator_spark.operators.shred", fromlist=["parse_request_documents"]
        ).parse_request_documents(
            spark.read.format("text").load(str(bronze)), column="value"
        )
    )
    rows = batch.collect()
    assert sum(r["n_requests"] for r in rows) == 12
    assert all(r["window_start"] is not None for r in rows)


def test_sessionize_stateful_operator(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(src))
    )
    sessions = S.sessionize_events_stream(
        stream, gap_seconds=1800, watermark="1 hour"
    )

    def _drain(name: str) -> list:
        # foreachBatch (not the memory sink): it supports restarting from
        # the same checkpoint, which this test does three times
        out: list = []
        q = (
            sessions.writeStream.foreachBatch(
                lambda df, _bid: out.extend(df.collect())
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_s"))
            .start()
        )
        q.awaitTermination()
        return out

    # run A: user 1 has two sessions in-batch (gap > 30 min) -> first one
    # closes immediately; user 2 opens a session.  watermark -> 8:00
    # (max event time 9:00 - 1h).
    events = [
        {"user_id": 1, "ts": "2024-03-01 08:00:00"},
        {"user_id": 1, "ts": "2024-03-01 08:10:00"},
        {"user_id": 1, "ts": "2024-03-01 09:00:00"},  # new session
        {"user_id": 2, "ts": "2024-03-01 09:00:00"},
    ]
    (src / "e0.json").write_text("\n".join(json.dumps(e) for e in events))
    rows = _drain("sessions_a")
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["n_events"] == 2
    assert r["session_start"].minute == 0 and r["session_end"].minute == 10

    # run B: an out-of-order event 15 min BEFORE user 2's open-session
    # start (within gap, above the 8:00 watermark) must extend the
    # session backwards.  user 1's 12:00 event closes their 9:00 session
    # and advances the watermark to 11:00.
    (src / "e1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"user_id": 2, "ts": "2024-03-01 08:45:00"},
                {"user_id": 1, "ts": "2024-03-01 12:00:00"},
            ]
        )
    )
    # availableNow runs a trailing no-new-data batch after the watermark
    # advances to 11:00 — past user 2's close point (9:30) — so the
    # idle-session TIMEOUT flushes user 2 in the same run, with the
    # backward-merged start.
    rows = {(r["user_id"], r["n_events"]): r for r in _drain("sessions_b")}
    assert len(rows) == 2
    assert rows[(1, 1)]["session_start"].hour == 9
    u2 = rows[(2, 2)]
    assert (u2["session_start"].hour, u2["session_start"].minute) == (8, 45)
    assert (u2["session_end"].hour, u2["session_end"].minute) == (9, 0)

    # run C: user 1's 12:00 session closes via the new 13:00 event; user
    # 2's state is gone (removed at timeout), nothing re-emits.
    (src / "e2.json").write_text(
        json.dumps({"user_id": 1, "ts": "2024-03-01 13:00:00"})
    )
    rows = _drain("sessions_c")
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 1)]
    assert rows[0]["session_start"].hour == 12


def test_sessionize_merges_stray_chains(spark, tmp_path):
    """Out-of-order events older than the open session must coalesce
    into proper sessions among themselves — not singleton spam."""
    src = tmp_path / "events2"
    src.mkdir()
    stream = (
        spark.readStream.schema("user_id long, ts timestamp").json(str(src))
    )
    sessions = S.sessionize_events_stream(
        stream, gap_seconds=1800, watermark="4 hours"
    )

    def _drain() -> list:
        out: list = []
        q = (
            sessions.writeStream.foreachBatch(
                lambda df, _bid: out.extend(df.collect())
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_s2"))
            .start()
        )
        q.awaitTermination()
        return out

    (src / "a.json").write_text(
        json.dumps({"user_id": 3, "ts": "2024-03-01 12:00:00"})
    )
    assert _drain() == []  # open session at 12:00, watermark 8:00

    # two strays within gap of EACH OTHER, both > 30 min before 12:00
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"user_id": 3, "ts": "2024-03-01 09:00:00"},
                {"user_id": 3, "ts": "2024-03-01 09:10:00"},
            ]
        )
    )
    rows = _drain()
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(3, 2)]
    assert rows[0]["session_start"].hour == 9
    assert rows[0]["session_end"].minute == 10
