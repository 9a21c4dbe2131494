"""connected_components / dup_clusters: correctness on known graphs plus
the one-action-per-round contract — the convergence signal is read off
the SAME materialization as the round's label propagation (a ``chg`` flag
on the lazily-localCheckpointed frame), not a separate edges-x-labels
join, so each round costs one job instead of two.
"""

from __future__ import annotations

import random

from jobcan_data_integrator_spark.operators.dedup import (
    connected_components,
    connected_components_twophase,
    dup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_on_known_graph(spark):
    # two components: path {1,2,3,4} and star {10,11,12}
    cc = connected_components(
        _edges(spark, [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12)])
    )
    assert cc.columns == ["doc_id", "cluster_id"]
    got = {(r.doc_id, r.cluster_id) for r in cc.collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
    }


def test_keep_marks_canonical_member(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in dup_clusters(pairs).collect()}
    assert rows == {5: (5, True), 9: (5, False), 7: (5, False)}


def test_one_action_per_round_no_convergence_join(spark, monkeypatch):
    # patch the CONCRETE DataFrame class (pyspark 4's public DataFrame is
    # a facade; classic sessions hand out a subclass with its own methods)
    df_cls = type(spark.range(1))
    counted_plans: list[str] = []
    real_count = df_cls.count

    def counting_count(self):
        counted_plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return real_count(self)

    eager_flags: list[bool] = []
    real_ckpt = df_cls.localCheckpoint

    def tracking_ckpt(self, eager=True, storageLevel=None):
        eager_flags.append(eager)
        return real_ckpt(self, eager=eager)

    monkeypatch.setattr(df_cls, "count", counting_count)
    monkeypatch.setattr(df_cls, "localCheckpoint", tracking_ckpt)

    connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)])).collect()

    # every per-round checkpoint is LAZY: the convergence count is the one
    # action that both materializes the round and reads the chg flags
    assert eager_flags and all(f is False for f in eager_flags)
    rounds = len(eager_flags)
    assert len(counted_plans) == rounds + 1  # +1 = the edge-cache warmup
    # and no counted plan re-runs a join: the round count scans the
    # checkpointed frame (LogicalRDD + filter), the warmup is a distinct
    # over a union
    assert not any("Join" in p for p in counted_plans)


# ---------------------------------------------------------------------------
# Two-phase (large-star/small-star) variant — the high-diameter scale path
# ---------------------------------------------------------------------------


def _cc_set(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def test_twophase_on_known_graph(spark):
    e = _edges(spark, [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12)])
    assert _cc_set(connected_components_twophase(e)) == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
    }


def test_twophase_long_chain_few_rounds(spark):
    # a 200-hop chain has diameter 200: label propagation needs ~200
    # rounds, the alternating algorithm O(log n) — cap max_iter at 12 to
    # PROVE the logarithmic convergence, not just the answer
    n = 200
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    got = _cc_set(connected_components_twophase(e, max_iter=12))
    assert got == {(i, 0) for i in range(n + 1)}


def test_twophase_matches_label_propagation_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        e = _edges(spark, edges)
        assert _cc_set(connected_components_twophase(e)) == _cc_set(
            connected_components(e, max_iter=60)
        ), f"trial {trial} diverged"


def test_twophase_on_gate_pair_graph(spark, sf_dir):
    from pyspark.sql import functions as F

    from jobcan_data_integrator_spark.gate.llm import dd_lsh_verified_pairs

    pairs = dd_lsh_verified_pairs(spark, sf_dir).filter(F.col("jaccard") >= 0.5)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    assert _cc_set(connected_components_twophase(e)) == _cc_set(
        connected_components(e)
    )


def test_keep_best_per_cluster(spark):
    """Highest score survives; ties break to the lowest id; singleton
    clusters keep their only member."""
    from jobcan_data_integrator_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    rows = [
        # cluster 0: doc 3 has the best score
        (1, 0, 0.2), (3, 0, 0.9), (7, 0, 0.5),
        # cluster 1: tie on 0.7 -> doc 4 (lower id) wins
        (4, 1, 0.7), (9, 1, 0.7),
        # singleton
        (11, 2, 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, cluster bigint, score double")
    out = keep_best_per_cluster(df)
    kept = sorted(r.doc_id for r in out.collect() if r.is_kept)
    assert kept == [3, 4, 11]
    assert out.count() == len(rows)  # every row labeled, none dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan  # algebraic agg, not a sort window


def test_keep_best_per_cluster_string_ids(spark):
    """String doc_ids (the common corpus-reader shape) must work: the
    old max(struct(score, -id)) tiebreak negated the id, which nulls a
    string and silently emitted is_kept=false for every row."""
    from jobcan_data_integrator_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    rows = [
        ("doc-b", 0, 0.9), ("doc-a", 0, 0.2),
        # tie -> lexicographically lowest id wins
        ("doc-z", 1, 0.7), ("doc-m", 1, 0.7),
    ]
    df = spark.createDataFrame(rows, "doc_id string, cluster bigint, score double")
    out = keep_best_per_cluster(df)
    kept = sorted(r.doc_id for r in out.collect() if r.is_kept)
    assert kept == ["doc-b", "doc-m"]
