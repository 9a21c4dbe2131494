"""Bronze-replay backfill (SURVEY.md §4.1: the raw-page archive enables
rebuilding silver with pure Spark, no API calls).

The scale path for this engine: ingestion is API-rate-bound (~1.4
doc/s), but a backfill reads the bronze JSON-lines archive as an
ordinary distributed scan — this test drives that exact path at a
volume two orders above the unit fixtures and checks the rebuilt silver
matches a direct shred of the same documents.
"""

from __future__ import annotations

import json
import time

from jobcan_fixtures import make_request_docs
from jobcan_data_integrator_spark.operators.shred import (
    parse_request_documents,
    shred_request_documents,
)
from jobcan_data_integrator_spark.pipeline import REQUEST_WRITES
from jobcan_data_integrator_spark.storage import TableStore

N_DOCS = 500


def test_bronze_replay_rebuilds_silver(spark, tmp_path):
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    bronze = tmp_path / "bronze" / "requests_detail"
    bronze.mkdir(parents=True)
    docs = make_request_docs(N_DOCS)
    # several files => several input splits, as a real archive would have
    for chunk in range(5):
        (bronze / f"part-{chunk}.json").write_text(
            "\n".join(docs[chunk::5]), encoding="utf-8"
        )

    store = TableStore(spark, tmp_path / "silver", write_partitions=2)
    t0 = time.perf_counter()
    parsed = parse_request_documents(
        spark.read.format("text").load(str(bronze)), column="value"
    )
    tables = shred_request_documents(parsed)
    for name, df in tables.items():
        kind, keys = REQUEST_WRITES.get(name) or REQUEST_WRITES["*"]
        if kind == "upsert":
            store.merge_upsert(name, df, keys)
        else:
            store.sync_children(name, df, keys)
    elapsed = time.perf_counter() - t0

    assert store.read("requests").count() == N_DOCS
    # spot-check a child table against a direct shred
    direct = shred_request_documents(
        parse_request_documents(
            spark.createDataFrame([(d,) for d in docs], "raw string")
        )
    )
    for name in ("customized_items", "approvers", "files", "expense_specific_rows"):
        a = {tuple(r) for r in store.read(name).collect()}
        b = {tuple(r) for r in direct[name].collect()}
        assert a == b, f"{name}: replay differs from direct shred"
    # replay of 500 nested docs through 31 tables should be well under
    # the API-bound time (500 docs / 1.39 docs/s ≈ 360 s)
    assert elapsed < 300, f"replay too slow: {elapsed:.1f}s"


def test_replay_is_idempotent_over_existing_silver(spark, tmp_path):
    """Replaying the same archive over an already-built store converges
    (same rows, no duplicates) — the crash-recovery contract."""
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    bronze = tmp_path / "bronze"
    bronze.mkdir(parents=True)
    docs = make_request_docs(40)
    (bronze / "b.json").write_text("\n".join(docs), encoding="utf-8")
    store = TableStore(spark, tmp_path / "silver", write_partitions=1)

    def replay():
        tables = shred_request_documents(
            parse_request_documents(
                spark.read.format("text").load(str(bronze)), column="value"
            )
        )
        for name, df in tables.items():
            kind, keys = REQUEST_WRITES.get(name) or REQUEST_WRITES["*"]
            (store.merge_upsert if kind == "upsert" else store.sync_children)(
                name, df, keys
            )

    replay()
    first = {
        name: store.read(name).count()
        for name in ("requests", "comments", "file_associations")
    }
    replay()
    second = {
        name: store.read(name).count()
        for name in ("requests", "comments", "file_associations")
    }
    assert first == second
