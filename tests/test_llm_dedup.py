"""Hot-shingle guard for the exhaustive n-gram Jaccard operator.

The raw shingle self-join is quadratic in per-shingle document frequency:
a boilerplate shingle shared by all k documents alone produces k*(k-1)/2
join rows.  ``ngram_jaccard_pairs(max_doc_freq=N)`` must drop such
shingles BEFORE the join, so a boilerplate-heavy corpus yields only the
genuinely similar pairs — and the Jaccard is computed over the capped
shingle universe on both engines (the gate oracle mirrors the filter).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.dedup import ngram_jaccard_pairs

N_DOCS = 60
BOILER = list(range(1, 7))  # 6 shingles present in EVERY doc
RARE = list(range(100, 110))  # 10 shingles shared only by docs 0 and 1


def _hot_corpus(spark):
    rows = []
    for d in range(N_DOCS):
        for s in BOILER:
            rows.append((d, s))
        if d in (0, 1):
            uniq = RARE
        else:
            uniq = range(1000 + d * 50, 1000 + d * 50 + 10)
        for s in uniq:
            rows.append((d, s))
    return spark.createDataFrame(rows, "doc_id long, shingle long")


def test_uncapped_blows_up_on_boilerplate(spark):
    """Ground truth of the failure mode: with no cap, the 6 corpus-wide
    boilerplate shingles alone make EVERY pair a >=5-common 'near-dup' —
    k*(k-1)/2 output rows."""
    sh = _hot_corpus(spark)
    pairs = ngram_jaccard_pairs(sh, min_common=5, max_doc_freq=None)
    assert pairs.count() == N_DOCS * (N_DOCS - 1) // 2


def test_doc_freq_cap_bounds_the_join(spark):
    """With the cap below the boilerplate df, only the genuinely shared
    pair survives, and its Jaccard is computed over the capped universe
    (10 rare shingles each, all shared -> 1.0)."""
    sh = _hot_corpus(spark)
    pairs = ngram_jaccard_pairs(sh, min_common=5, max_doc_freq=30)
    rows = pairs.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.n_common) == (0, 1, len(RARE))
    assert r.jaccard == 1.0


def test_cap_keeps_shingles_at_or_below_threshold(spark):
    """df == cap is kept (strictly-greater drop): with the cap exactly at
    the boilerplate df, results match the uncapped run."""
    sh = _hot_corpus(spark)
    capped = ngram_jaccard_pairs(sh, min_common=5, max_doc_freq=N_DOCS)
    uncapped = ngram_jaccard_pairs(sh, min_common=5, max_doc_freq=None)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_hot_set_is_broadcast_anti_join(spark):
    """Plan guard: the hot-shingle exclusion must be a BroadcastHashJoin
    LeftAnti (tiny hot set broadcast), not a shuffle of the corpus
    against itself."""
    sh = _hot_corpus(spark)
    plan = ngram_jaccard_pairs(sh, min_common=5, max_doc_freq=30)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_gate_oracle_parity_is_pinned_elsewhere():
    """dd_ngram_jaccard_pairs (gate/llm.py) applies the same cap with a
    mirrored DuckDB oracle — parity is covered by test_gate_oracle.py;
    this file pins the operator-level guard semantics."""
    assert True
