"""connected_components / dup_clusters: correctness on known graphs plus
the one-action-per-round contract — the convergence signal is read off
the SAME materialization as the round's label propagation (a ``chg`` flag
on the lazily-localCheckpointed frame), not a separate edges-x-labels
join, so each round costs one job instead of two.
"""

from __future__ import annotations

from jobcan_data_integrator_spark.operators.dedup import (
    connected_components,
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
