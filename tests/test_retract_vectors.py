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
    assert store.read(inc.EMB_RETRACTIONS).count() == 0
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


def test_retract_vectors_requires_snapshot(spark, tmp_path):
    plain = TableStore(spark, tmp_path)
    with pytest.raises(ValueError, match="snapshot"):
        retract_vectors(
            plain,
            plain.spark.range(3).select(F.col("id").alias("vec_id")),
            "r",
        )
