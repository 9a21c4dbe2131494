"""JSONL/CSV corpus readers with quarantine (sources/corpus.py) and
cluster-balanced sampling (operators/selection.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.selection import sample_per_cluster
from jobcan_data_integrator_spark.sources.corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
)

JSONL_GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
]
JSONL_BAD = [
    '{"doc_id": 3, "text": "truncated',        # invalid JSON
    'not json at all',
    '{"doc_id": "not-a-number", "text": "x", "lang": "en"}',  # type error
]


def test_jsonl_split(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(JSONL_GOOD + JSONL_BAD) + "\n")
    res = read_jsonl_corpus(
        spark, str(p), "doc_id bigint, text string, lang string"
    )
    good = {r.doc_id: (r.text, r.lang) for r in res.good.collect()}
    assert good == {1: ("hello world", "en"), 2: ("bonjour", "fr")}
    bad = sorted(r.raw for r in res.quarantined.collect())
    assert bad == sorted(JSONL_BAD)  # raw lines preserved for replay
    assert all(
        r.source_file.endswith("corpus.jsonl")
        for r in res.quarantined.collect()
    )


def test_jsonl_all_good_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text("\n".join(JSONL_GOOD) + "\n")
    res = read_jsonl_corpus(
        spark, str(p), "doc_id bigint, text string, lang string"
    )
    assert res.quarantined.count() == 0
    assert res.good.count() == 2


def test_csv_split(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,score\n"
        "1,alpha,0.5\n"
        "2,beta,0.9\n"
        "3,gamma,not-a-double\n"
    )
    res = read_csv_corpus(
        spark, str(p), "doc_id bigint, text string, score double"
    )
    good = {r.doc_id: (r.text, r.score) for r in res.good.collect()}
    assert good == {1: ("alpha", 0.5), 2: ("beta", 0.9)}
    assert [r.raw for r in res.quarantined.collect()] == [
        "3,gamma,not-a-double"
    ]


def _replica_sample(rows, k, salt="cluster-sample"):
    by_cluster: dict[int, list[tuple[str, int]]] = {}
    for doc_id, cluster in rows:
        key = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()
        by_cluster.setdefault(cluster, []).append((key, doc_id))
    keep = set()
    for members in by_cluster.values():
        for _, doc_id in sorted(members)[:k]:
            keep.add(doc_id)
    return keep


def test_sample_per_cluster_matches_replica(spark):
    rows = [(i, i % 3) for i in range(40)] + [(100 + i, 9) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, cluster int")
    got = {
        r.doc_id for r in sample_per_cluster(df, k=5).collect()
    }
    assert got == _replica_sample(rows, 5)
    # caps respected; small clusters keep everything
    sizes = (
        sample_per_cluster(df, k=5)
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert {r.cluster: r["count"] for r in sizes} == {0: 5, 1: 5, 2: 5, 9: 2}


def test_sample_per_cluster_salt_redraws_deterministically(spark):
    rows = [(i, 0) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, cluster int")
    a = {r.doc_id for r in sample_per_cluster(df, k=10, salt="a").collect()}
    a2 = {r.doc_id for r in sample_per_cluster(df, k=10, salt="a").collect()}
    b = {r.doc_id for r in sample_per_cluster(df, k=10, salt="b").collect()}
    assert a == a2 == _replica_sample(rows, 10, "a")
    assert b == _replica_sample(rows, 10, "b")
    assert a != b  # a new salt is a fresh draw
