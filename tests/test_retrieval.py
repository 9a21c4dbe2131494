"""BM25 retrieval — pure-Python replica oracle + behavior pins.

The driver gate (rt_bm25_topk) proves Spark ≡ DuckDB on the generated
corpus; these tests pin operators/retrieval.py against an independent
from-first-principles replica on a crafted corpus where every score is
hand-checkable: exact micro-unit scores, the stop-term cap, the
deterministic tiebreak, unseen-term queries, and the non-broadcast
query path.
"""

from __future__ import annotations

import math

import pytest

from jobcan_data_integrator_spark.operators.retrieval import (
    MICRO,
    bm25_scores,
    bm25_topk,
    build_inverted_index,
    query_terms,
)

CORPUS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date"),
    (2, "apple apple apple banana banana"),
    (3, "elderberry fig"),
    (4, "apple fig fig banana"),
    (5, "apple fig fig banana"),  # exact twin of 4 -> tie in every score
]

QUERIES = [
    (100, "apple fig"),
    (101, "banana banana cherry"),  # duplicate query term collapses
    (102, "zzz unseen"),
]


def _replica(corpus, queries, k1=1.2, b=0.75, max_df_ratio=None):
    """Independent BM25: dict-of-lists, no Spark, Robertson idf."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    out: dict[tuple[int, int], int] = {}
    for qid, qtext in queries:
        for term in set(qtext.lower().split()):
            if term not in df:
                continue
            if max_df_ratio is not None and df[term] > n * max_df_ratio:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
                # Spark F.round = HALF_UP = away-from-zero for positives
                out[(qid, d)] = out.get((qid, d), 0) + int(
                    math.floor(idf * tfn * MICRO + 0.5)
                )
    return out


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return build_inverted_index(docs)


@pytest.fixture(scope="module")
def qt(spark):
    q = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    return query_terms(q)


def _collect_scores(df) -> dict[tuple[int, int], int]:
    return {(r.q_id, r.doc_id): r.score_micro for r in df.collect()}


def test_scores_match_replica_exactly(index, qt):
    got = _collect_scores(bm25_scores(index, qt))
    assert got == _replica(CORPUS, QUERIES)


def test_duplicate_query_terms_collapse(spark, index):
    """Query-side tf is capped at 1: 'banana banana' scores = 'banana'."""
    one = query_terms(spark.createDataFrame([(1, "banana")], "q_id long, q_text string"))
    two = query_terms(
        spark.createDataFrame([(1, "banana banana")], "q_id long, q_text string")
    )
    assert _collect_scores(bm25_scores(index, one)) == _collect_scores(
        bm25_scores(index, two)
    )


def test_unseen_terms_produce_no_rows(index, qt):
    scored = bm25_scores(index, qt)
    assert scored.filter("q_id = 102").count() == 0


def test_stop_term_cap_drops_ubiquitous_terms(index, qt):
    """max_df_ratio excludes high-df terms from scoring: 'apple' (df 4/6)
    and 'banana' (df 5/6) fall to a 0.5 cap; 'fig' (df 3/6) survives."""
    got = _collect_scores(bm25_scores(index, qt, max_df_ratio=0.5))
    assert got == _replica(CORPUS, QUERIES, max_df_ratio=0.5)
    # apple-only docs (0, 2) no longer match query 100 at all
    assert {d for (q, d) in got if q == 100} == {3, 4, 5}


def test_topk_tiebreak_is_doc_id_ascending(index, qt):
    """Docs 4 and 5 are exact twins — identical scores; the cut must
    order them 4 then 5, every engine, every run."""
    top = bm25_topk(bm25_scores(index, qt), k=10)
    rows = [(r.doc_id, r.rank) for r in top.filter("q_id = 100").collect()]
    ranks = dict(rows)
    assert ranks[4] + 1 == ranks[5]
    scores = _collect_scores(bm25_scores(index, qt))
    assert scores[(100, 4)] == scores[(100, 5)]


def test_topk_truncates_per_query(index, qt):
    top = bm25_topk(bm25_scores(index, qt), k=2)
    counts = {r.q_id: r.n for r in top.groupBy("q_id").count().withColumnRenamed("count", "n").collect()}
    assert counts == {100: 2, 101: 2}


def test_shuffled_query_path_matches_broadcast(index, qt):
    bc = _collect_scores(bm25_scores(index, qt, broadcast_queries=True))
    sh = _collect_scores(bm25_scores(index, qt, broadcast_queries=False))
    assert bc == sh


def test_index_stats(index):
    stats = index.corpus.collect()[0]
    assert stats.n_docs == 6
    assert stats.avgdl == pytest.approx(sum(len(t.split()) for _, t in CORPUS) / 6)
    df_map = {r.term: r.df for r in index.term_stats.collect()}
    assert df_map["apple"] == 4 and df_map["banana"] == 5 and df_map["date"] == 1


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion
# ---------------------------------------------------------------------------


def _rrf_replica(lists, k=60, topk=10):
    """Independent RRF: dict accumulation, float 1e6/(k+rank) HALF_UP."""
    acc: dict[tuple[int, int], list] = {}
    for lst in lists:
        for q, d, rank in lst:
            e = acc.setdefault((q, d), [0, 0])
            e[0] += int(math.floor(1_000_000 / (k + rank) + 0.5))
            e[1] += 1
    out = []
    byq: dict[int, list] = {}
    for (q, d), (s, n) in acc.items():
        byq.setdefault(q, []).append((d, s, n))
    for q, rows in byq.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        for i, (d, s, n) in enumerate(rows[:topk], start=1):
            out.append((q, d, i, s, n))
    return sorted(out)


def test_rrf_fuse_matches_replica(spark):
    from jobcan_data_integrator_spark.operators.retrieval import rrf_fuse

    lex = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)]
    dense = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (3, 30, 1)]  # q3: dense-only
    schema = "q_id long, doc_id long, rank int"
    fused = rrf_fuse(
        [spark.createDataFrame(lex, schema), spark.createDataFrame(dense, schema)]
    )
    got = sorted(
        (r.q_id, r.doc_id, r.rrf_rank, r.rrf_micro, r.n_lists)
        for r in fused.collect()
    )
    assert got == _rrf_replica([lex, dense])
    # doc in both lists outranks any single-list doc at comparable ranks
    by_qd = {(q, d): rank for q, d, rank, _, _ in got}
    assert by_qd[(1, 11)] == 1


def test_rrf_fuse_topk_and_tiebreak(spark):
    from jobcan_data_integrator_spark.operators.retrieval import rrf_fuse

    # equal contributions -> doc_id ascending breaks the tie
    lst = [(1, d, 1) for d in (5, 3, 9)]  # same rank=1 in 3 "lists"
    schema = "q_id long, doc_id long, rank int"
    frames = [spark.createDataFrame([row], schema) for row in lst]
    fused = rrf_fuse(frames, topk=2)
    got = [(r.doc_id, r.rrf_rank) for r in fused.collect()]
    assert sorted(got) == [(3, 1), (5, 2)]  # 9 cut by topk=2


def test_rrf_fuse_rejects_empty_input():
    from jobcan_data_integrator_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
