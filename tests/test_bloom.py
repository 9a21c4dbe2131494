"""Bloom-filter decontamination (operators/bloom.py).

Contract: NO false negatives ever (the candidate set is a superset of
true members), measured false-positive rate near the target, and the
end-to-end sweep EXACTLY equal to the broadcast-join reference — the
verify join must kill every false positive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.bloom import (
    bloom_candidates,
    bloom_contamination,
    build_bloom,
    optimal_params,
)


def test_optimal_params_textbook_shape():
    m, k = optimal_params(10_000, fpr=0.01)
    assert m % 64 == 0
    assert 9 <= m / 10_000 <= 10.1  # ~9.6 bits/element at 1%
    assert k == 7
    with pytest.raises(ValueError):
        optimal_params(0)
    with pytest.raises(ValueError):
        optimal_params(10, fpr=1.5)


def test_no_false_negatives_and_bounded_fpr(spark):
    members = [3 * i + 1 for i in range(2_000)]
    non_members = [900_000_000 + 7 * i for i in range(20_000)]
    corpus = spark.createDataFrame(
        [(v,) for v in members + non_members], "shingle long"
    )
    got = {
        r["shingle"] for r in bloom_candidates(corpus, members, fpr=0.01).collect()
    }
    assert set(members) <= got  # NO false negatives
    fp = len(got - set(members))
    assert fp / len(non_members) < 0.03  # ~1% target, generous bound


def test_sweep_equals_broadcast_join_reference(spark, sf_dir):
    from jobcan_data_integrator_spark.gate._common import _H, _shingle_rows

    hashed = _shingle_rows(spark, sf_dir).select(
        "doc_id", F.expr(_H.format(x="shingle")).alias("shingle")
    )
    bench = (
        hashed.filter(F.col("doc_id") < 5)
        .distinct()
        .localCheckpoint(eager=True)
    )
    corpus = hashed.filter(F.col("doc_id") >= 5)

    got = {
        (r["doc_id"], r["bench_id"], r["n_hits"])
        for r in bloom_contamination(corpus, bench, min_hits=3).collect()
    }
    want = {
        (r["doc_id"], r["bench_id"], r["n_hits"])
        for r in corpus.join(
            F.broadcast(
                bench.select(F.col("doc_id").alias("bench_id"), "shingle")
            ),
            "shingle",
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
        .filter(F.col("n_hits") >= 3)
        .collect()
    }
    assert want  # the corpus must actually be contaminated
    assert got == want


def test_corpus_side_plan_is_a_narrow_scan(spark):
    corpus = spark.range(1000).select(F.col("id").alias("shingle"))
    plan = (
        bloom_candidates(corpus, [1, 2, 3], fpr=0.01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bit array attaches via a one-row broadcast; the membership
    # test itself must add no shuffle
    assert "Exchange hashpartitioning" not in plan


def test_build_bloom_sets_expected_bits():
    words = build_bloom([42], 128, 2)
    assert sum(bin(w).count("1") for w in words) <= 2  # k bits (or fewer on collision)
    assert any(words)
