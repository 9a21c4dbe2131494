"""Token-budget shard packing: the prefix-sum semantics (oracle-gated in
tx_shard_packing) plus the deterministic shuffled-order mode training
pipelines actually use."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.packing import pack_shards

BUDGET = 100


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(45)) + 5).alias("n_tokens"),
    )


def _check_packing(rows, budget):
    """Validity of ANY packing: cum_before is the running sum in the
    emitted order, shard = cum_before div budget."""
    rows = sorted(rows, key=lambda r: r.cum_before)
    acc = 0
    for r in rows:
        assert r.cum_before == acc
        assert r.shard_id == acc // budget
        acc += r.n_tokens
    return acc


def test_id_order_packing_matches_definition(spark):
    rows = pack_shards(_docs(spark), budget=BUDGET).collect()
    total = _check_packing(rows, BUDGET)
    assert total == sum(r.n_tokens for r in rows)
    # id order: cum_before is monotone in doc_id
    by_id = sorted(rows, key=lambda r: r.doc_id)
    assert [r.cum_before for r in by_id] == sorted(r.cum_before for r in rows)


def test_shuffled_packing_is_valid_deterministic_permutation(spark):
    a = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch0").collect()
    b = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch0").collect()
    c = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch1").collect()
    ident = pack_shards(_docs(spark), budget=BUDGET).collect()

    # same doc set + token counts, valid prefix sum in the shuffled order
    _check_packing(a, BUDGET)
    assert {(r.doc_id, r.n_tokens) for r in a} == {(r.doc_id, r.n_tokens) for r in ident}
    # deterministic: same salt -> identical packing (no RNG state)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different salt and the id order both give a DIFFERENT permutation
    order = lambda rows: [r.doc_id for r in sorted(rows, key=lambda r: r.cum_before)]
    assert order(a) != order(ident)
    assert order(a) != order(c)


def test_shuffled_packing_has_no_global_window(spark):
    plan = (
        pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pathological_bucket_size_is_rejected(spark):
    # an explicit tiny bucket_size would collect one offset row per bucket
    # (range/bucket_size rows) — the guard fails loudly BEFORE the collect
    docs = _docs(spark, n=500_000)
    with pytest.raises(ValueError, match="bucket_size"):
        pack_shards(docs, budget=BUDGET, bucket_size=1)


def test_sane_explicit_bucket_size_still_packs(spark):
    rows = pack_shards(_docs(spark, n=200), budget=BUDGET, bucket_size=50).collect()
    _check_packing(rows, BUDGET)
