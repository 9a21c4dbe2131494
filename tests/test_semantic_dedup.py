"""semantic_dedup (operators/similarity.py): SemDeDup-style composition
— k-means cells, within-cell cosine threshold graph, min-id survivor per
duplicate component.  Oracle: a pure-Python replica (sequential-fold
cosine matching cosine_expr's index-ordered double math + union-find)
over the collected assignment."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.similarity import (
    quantized_expr,
    semantic_dedup,
    train_ivf_centroids,
)
from jobcan_data_integrator_spark.session import load_table

THRESHOLD = 0.2  # synthetic embeddings are near-orthogonal; 0.95 finds nothing


def _cosine(a, b):
    # replicate cosine_expr exactly: sequential left fold, double math,
    # round-half-up at 6 dp
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    v = dot / (math.sqrt(na) * math.sqrt(nb))
    return math.floor(v * 1e6 + 0.5) / 1e6 if v >= 0 else -(
        math.floor(-v * 1e6 + 0.5) / 1e6
    )


def _expected(rows):
    """Union-find over the within-cell threshold graph; keep = min id."""
    parent = {r.vec_id: r.vec_id for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r)
    for members in by_cell.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                if _cosine(a.embedding, b.embedding) >= THRESHOLD:
                    ra, rb = find(a.vec_id), find(b.vec_id)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for r in rows:
        comp.setdefault(find(r.vec_id), []).append(r.vec_id)
    keep = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            keep[v] = v == m
    return keep


def test_matches_python_replica(spark, sf_dir):
    from jobcan_data_integrator_spark.operators.similarity import assign_cells

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    cent, _ = train_ivf_centroids(emb, n_cells=8, iters=2)
    got = {
        r.vec_id: (r.cell_id, r.keep)
        for r in semantic_dedup(emb, centroids=cent, threshold=THRESHOLD).collect()
    }
    rows = assign_cells(
        emb.select("vec_id", "embedding", quantized_expr("embedding").alias("q")),
        cent,
        keep=("embedding",),
    ).collect()
    want_keep = _expected(rows)
    want_cell = {r.vec_id: r.cell_id for r in rows}

    assert set(got) == set(want_keep)  # every vector labeled exactly once
    for v, (cell, keep) in got.items():
        assert cell == want_cell[v]
        assert keep == want_keep[v], f"vec {v}"
    # the threshold must have actually produced duplicates to prove anything
    assert sum(1 for _, k in got.values() if not k) > 0


def test_impossible_threshold_keeps_everything(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semantic_dedup(emb, n_cells=4, iters=1, threshold=1.1)
    assert out.filter(~F.col("keep")).count() == 0
    assert out.count() == emb.count()
