"""Multimodal plumbing tests: the Spark-side contract (schema, 1:1 and 1:N
batch shapes, determinism across partitionings) is real even though the
media decode itself is a deterministic stub (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    METADATA_SCHEMA,
    RESIZED_SCHEMA,
    _fake_decode,
    extract_binary_metadata,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, f"payload-{i}".encode() * (1 + i % 7), "image/png") for i in range(50)]
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, mime string"
    ).cache()


def test_metadata_schema_and_determinism(media):
    out = extract_binary_metadata(media)
    assert out.schema == METADATA_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 50
    # stable across a different partitioning
    again = {
        r["doc_id"]: r for r in extract_binary_metadata(media.repartition(7)).collect()
    }
    assert rows == again
    r = rows[3]
    assert r["n_bytes"] == len(b"payload-3" * 4)
    assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255


def test_resize_one_to_one(media):
    out = resize_media(media.select("doc_id", "payload"), 128, 96)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows)
    # deterministic payload: same input -> same resized bytes
    one = {r["doc_id"]: bytes(r["payload"]) for r in rows}
    two = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_media(media.select("doc_id", "payload"), 128, 96).collect()
    }
    assert one == two


def test_frame_sampling_one_to_many(media):
    out = sample_frames(media.select("doc_id", "payload"), every_n=5)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    # per doc: ceil(n_frames / 5) frames, frame_idx = 0, 5, 10, ...
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    payloads = {(r["doc_id"]): bytes(r["frame_payload"]) for r in rows}
    for doc_id, payload, _ in media.collect():
        n = _fake_decode(bytes(payload))["n_frames"]
        assert sorted(by_doc[doc_id]) == list(range(0, n, 5))
    assert len(set(payloads.values())) == len(payloads)  # distinct per frame


def test_feature_extraction_feeds_similarity(media, spark):
    feats = extract_features(media.select("doc_id", "payload"), dim=16)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r["feature"])
    # the extracted features run through the ANN operator unchanged
    from jobcan_data_integrator_spark.operators.similarity import ann_topk_lsh

    emb = feats.select(F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding"))
    topk = ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 2), k=3, dim=16)
    got = topk.collect()
    assert all(r["q_id"] in (0, 1) and r["vec_id"] != r["q_id"] for r in got)
