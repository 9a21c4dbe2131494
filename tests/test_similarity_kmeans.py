"""IVF k-means trainer — exact-value check against an independent NumPy
replica.

The gate has no SQL oracle (iterative algorithm), so this test is its
correctness anchor: the Spark pipeline and a from-scratch NumPy Lloyd's
implementation must agree BIT-FOR-BIT, which only holds because both run
the same all-integer arithmetic (quantize -> integer dot argmax ->
floor-mean).  Any float drift or ordering nondeterminism in the Spark
side breaks this immediately.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from jobcan_data_integrator_spark.operators.similarity import (
    ivf_codebook_stats,
    train_ivf_centroids,
)

N_CELLS = 16
ITERS = 2


def _numpy_reference(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = tbl["vec_id"].to_numpy()
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    q = np.floor(emb * 1000).astype(np.int64)

    cent_ids = [int(v) for v in vec_ids if v < N_CELLS]
    cents = {cid: q[np.where(vec_ids == cid)[0][0]].copy() for cid in cent_ids}
    assign = {}
    for _ in range(ITERS):
        assign = {}
        cell_list = sorted(cents)
        cmat = np.stack([cents[c] for c in cell_list])
        dots = q @ cmat.T  # int64 exact
        for i, vid in enumerate(vec_ids):
            best = max(range(len(cell_list)), key=lambda j: (dots[i, j], -cell_list[j]))
            assign[int(vid)] = cell_list[best]
        new = {}
        for cid in cell_list:
            members = [i for i, vid in enumerate(vec_ids) if assign[int(vid)] == cid]
            if not members:
                continue
            s = q[members].sum(axis=0)
            n = len(members)
            new[cid] = np.array([math.floor(x / n) for x in s], dtype=np.int64)
        cents = new
    return cents, assign


@pytest.fixture(scope="module")
def spark_result(spark, sf_dir):
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent, assign = train_ivf_centroids(emb, n_cells=N_CELLS, iters=ITERS)
    return (
        {r["cell_id"]: np.array(r["cq"], dtype=np.int64) for r in cent.collect()},
        {r["vec_id"]: r["cell_id"] for r in assign.collect()},
    )


def test_assignment_matches_numpy(spark_result, sf_dir):
    _, np_assign = _numpy_reference(sf_dir)
    s_cent, s_assign = spark_result
    assert s_assign == np_assign


def test_centroids_match_numpy_exactly(spark_result, sf_dir):
    np_cent, _ = _numpy_reference(sf_dir)
    s_cent, _ = spark_result
    assert sorted(s_cent) == sorted(np_cent)
    for cid in np_cent:
        assert np.array_equal(s_cent[cid], np_cent[cid]), f"cell {cid} differs"


def test_codebook_stats_consistent(spark, sf_dir):
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stats = {r["cell_id"]: r for r in ivf_codebook_stats(emb, N_CELLS, ITERS).collect()}
    np_cent, np_assign = _numpy_reference(sf_dir)
    for cid, c in np_cent.items():
        n = sum(1 for v in np_assign.values() if v == cid)
        if n == 0:
            continue
        assert stats[cid]["n_members"] == n
        assert stats[cid]["centroid_checksum"] == int(c.sum())


def test_multiprobe_recall_not_worse_than_single_probe(spark, sf_dir):
    """Multi-probe LSH probes a superset of the single bucket, so its
    per-query recall@5 against the exact top-5 can only improve."""
    from pyspark.sql import functions as F
    from jobcan_data_integrator_spark.gate.llm import _brute_topk
    from jobcan_data_integrator_spark.operators.similarity import (
        ann_recall_at_k,
        ann_topk_lsh,
        ann_topk_lsh_multiprobe,
    )
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = _brute_topk(emb, queries, k=5)
    single = {
        r["q_id"]: r["recall"]
        for r in ann_recall_at_k(
            ann_topk_lsh(emb, queries, k=5), truth, k=5
        ).collect()
    }
    multi = {
        r["q_id"]: r["recall"]
        for r in ann_recall_at_k(
            ann_topk_lsh_multiprobe(emb, queries, k=5, n_probe=3), truth, k=5
        ).collect()
    }
    assert set(multi) == set(single) == {0, 1, 2, 3, 4}
    for q in single:
        assert multi[q] >= single[q]
    # multi-probe candidates are a strict superset -> aggregate recall
    # strictly improves on this data (pinned so a probe regression shows)
    assert sum(multi.values()) >= sum(single.values())


def test_recall_k_mismatch_raises(spark):
    """ann_recall_at_k's k is enforced: a truth frame whose per-query
    group size differs from k must fail loudly instead of silently
    mislabeling the metric."""
    import pytest
    from jobcan_data_integrator_spark.operators.similarity import ann_recall_at_k

    ann = spark.createDataFrame([(0, 1)], "q_id long, vec_id long")
    truth = spark.createDataFrame([(0, 1), (0, 2)], "q_id long, vec_id long")
    ok = ann_recall_at_k(ann, truth, k=2).collect()
    assert [(r.q_id, r.n_hit, r.recall) for r in ok] == [(0, 1, 0.5)]
    with pytest.raises(Exception, match="truth group size"):
        ann_recall_at_k(ann, truth, k=5).collect()


def test_multiband_near_dup_recall_not_worse(spark, sf_dir):
    """Multi-band LSH candidates are a superset of single-band's (band 0
    is the same 8 planes), so the banded pair set can only grow toward
    the brute-force truth — the recall knob that lets n_planes scale up
    with the corpus without losing pairs."""
    from pyspark.sql import functions as F
    from jobcan_data_integrator_spark.operators.similarity import (
        cosine_expr,
        embedding_near_dup_pairs,
    )
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    thr = 0.2

    def pair_set(df):
        rows = df.collect()
        assert len(rows) == len({(r.vec_a, r.vec_b) for r in rows}), "dup pairs"
        return {(r.vec_a, r.vec_b) for r in rows}

    one = pair_set(embedding_near_dup_pairs(emb, threshold=thr))
    four = pair_set(embedding_near_dup_pairs(emb, threshold=thr, n_bands=4))
    assert one <= four

    a = emb.alias("a")
    b = emb.alias("b")
    truth = pair_set(
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_expr("a.embedding", "b.embedding").alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= thr)
    )
    assert four <= truth  # LSH prefilter never invents pairs
    if truth:
        assert len(four) / len(truth) >= len(one) / len(truth)


def test_ivf_train_search_composition(spark, sf_dir):
    """The full IVF story composes: train_ivf_centroids -> codebook ->
    ann_topk_ivf(centroids=...).  Training's job at fixed n_probe is
    BALANCE (even cell sizes = even probe cost and bounded per-cell
    candidate lists at scale), so the pinned properties are: the search
    still returns k results per query with sane recall, and the trained
    codebook's cell-size distribution is tighter than the seed one's."""
    from pyspark.sql import functions as F
    from statistics import pvariance

    from jobcan_data_integrator_spark.gate.llm import _brute_topk
    from jobcan_data_integrator_spark.operators.similarity import (
        ann_topk_ivf,
        assign_cells,
        quantized_expr,
        train_ivf_centroids,
    )
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = {(r.q_id, r.vec_id) for r in _brute_topk(emb, queries, k=5).collect()}

    cent, _assign = train_ivf_centroids(emb, n_cells=16, iters=2)
    cent = cent.cache()
    res = ann_topk_ivf(emb, queries, k=5, n_probe=2, centroids=cent).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r.q_id, []).append(r.vec_id)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in per_q.values())
    hits = {(r.q_id, r.vec_id) for r in res}
    assert len(hits & truth) / len(truth) >= 0.5

    vq = emb.select("vec_id", quantized_expr().alias("q"))
    seed_cent = vq.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell_id"), F.col("q").alias("cq")
    )

    def cell_sizes(codebook):
        return [
            r["count"]
            for r in assign_cells(vq, codebook).groupBy("cell_id").count().collect()
        ]

    assert pvariance(cell_sizes(cent)) < pvariance(cell_sizes(seed_cent))
