"""Physical-plan regression tests — the 100 TB guardrails.

Correctness tests prove the right ANSWER; these prove the right PLAN.
Each assertion pins a scale-critical property that `.explain("formatted")`
audits found and that a refactor could silently regress:

- predicate pushdown + column pruning reach the parquet scans;
- aggregations partial-aggregate map-side before the exchange;
- dimension joins broadcast (no all-to-all shuffle of the fact side);
- the reference-parity surface contains ZERO Python evaluation nodes —
  every expression is JVM-side Catalyst (SURVEY.md §2.8 contract);
- the multimodal path, by contrast, IS an Arrow mapInPandas node.

Plan construction never runs a job, so these tests are cheap.
"""

from __future__ import annotations

import re

import pytest

from jobcan_data_integrator_spark.gate import REGISTRY, _ensure_loaded

_ensure_loaded()

#: any Python-evaluation physical node (row-at-a-time or Arrow-batched)
_PY_NODES = re.compile(
    r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
    r"|FlatMapsInPandas|PythonMapInArrow|AggregateInPandas"
)


def _plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def _gate_plan(spark, sf_dir, name: str) -> str:
    return _plan(REGISTRY[name].spark(spark, sf_dir))


NON_PYTHON_GATES = sorted(n for n in REGISTRY if not n.startswith("mm_"))


@pytest.mark.parametrize("name", NON_PYTHON_GATES)
def test_parity_surface_has_no_python_nodes(spark, sf_dir, name):
    """SURVEY §2.8: the whole reference-parity + dedup/similarity/text
    surface compiles to JVM-side expressions — a Python node in any of
    these plans is a 10-100x scale regression."""
    plan = _gate_plan(spark, sf_dir, name)
    hit = _PY_NODES.search(plan)
    assert hit is None, f"{name}: Python eval node {hit.group(0)} in plan"


def test_multimodal_is_arrow_map_in_pandas(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "mm_binary_metadata")
    assert "MapInPandas" in plan


def test_q1_scan_prunes_and_pushes_down(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "q1_pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "LessThan(l_quantity" in m.group(1), "filter not pushed to scan"
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read is not None
    cols = {c.split(":")[0] for c in read.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus",
    }, f"scan reads more than the projection needs: {cols}"


def test_q1_aggregates_map_side(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan, "no map-side partial aggregation"
    assert plan.index("partial_sum") < plan.index("Exchange") or (
        "partial_sum" in plan.split("Exchange")[0]
        or "HashAggregate" in plan.split("Exchange")[0]
    )


def test_a5_first_is_algebraic_not_window(spark, sf_dir):
    """A5's deterministic 'first row per group' is min(struct(...)) — it
    must partial-aggregate before the exchange instead of shuffling the
    whole fan-out through a window sort."""
    plan = _gate_plan(spark, sf_dir, "a5_fanout_collapse")
    assert "partial_min" in plan
    assert "Window" not in plan


def test_dims_broadcast_in_nation_revenue(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "j5_nation_revenue")
    assert "BroadcastHashJoin" in plan, "dimension join did not broadcast"


def test_ivf_probe_and_queries_broadcast(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "sim_ann_ivf_topk")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "IVF probe/query joins should broadcast the small sides"
    )


def test_ivf_training_assignment_is_windowless(spark, sf_dir):
    """Cell assignment must stay a pure map (in-row argmax over the
    broadcast codebook). A Window node here means someone reintroduced
    the n_cells-fold row explosion + sort shuffle per iteration."""
    plan = _gate_plan(spark, sf_dir, "sim_ivf_train_kmeans")
    assert "Window" not in plan


def test_i2_catchup_pushes_predicates(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "i2_open_items_catchup")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and any(p.strip() for p in pushed), (
        "catch-up branches must push their predicates into the scan"
    )


def test_exact_dedup_partial_aggregates(spark, sf_dir):
    plan = _gate_plan(spark, sf_dir, "dd_exact_dedup")
    assert "partial_min" in plan and "partial_count" in plan


#: gates whose plans INTENTIONALLY contain a broadcast nested-loop join:
#: the brute-force cosine scorers crossJoin a tiny broadcast query set,
#: and the IVF gates attach a ONE-ROW broadcast codebook (cents_row).
#: Each is O(n * small-constant) work — not a data-data cartesian.
_INTENTIONAL_BNLJ = {
    "sim_cosine_topk",
    "sim_ann_ivf_topk",
    "sim_ann_recall",
    "sim_ivf_train_kmeans",
    # the SemDeDup half scores cells via assign_cells' one-row broadcast
    # codebook crossJoin (same shape as the IVF gates); the pair join
    # itself is a cell-keyed equi-join
    "dd_embedding_cosine_pairs",
    # the LM perplexity side crossJoins the ONE-ROW (n_tokens, n_vocab)
    # totals broadcast (operators/lm.score_trigrams); every count join
    # is a hash-keyed equi-join
    "tx_lang_id",
    # the DSIR scorer crossJoins the ONE-ROW floor_dq broadcast
    # (operators/selection.dsir_weights); the delta-table join is a
    # broadcast hash equi-join on the bucket key
    "tx_stratified_sample",
    # BM25 attaches the ONE-ROW (n_docs, avgdl) corpus stats broadcast
    # (operators/retrieval.bm25_scores); the posting-list walk itself is
    # a term-keyed broadcast hash equi-join
    "rt_bm25_topk",
    # the hybrid gate composes BOTH allowed shapes: the BM25 corpus-stats
    # one-row broadcast and the dense side's broadcast-tiny query
    # crossJoin (the sim_cosine_topk brute baseline); the RRF fusion
    # itself is a union + keyed aggregation, no join at all
    "rt_hybrid_rrf",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_products_suite_wide(spark, sf_dir, name):
    """A CartesianProduct node anywhere is a data-data cross — the
    instant 100 TB killer.  BroadcastNestedLoopJoin is allowed only for
    the gates that deliberately broadcast a tiny side."""
    plan = _gate_plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _INTENTIONAL_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned nested-loop join"
        )


@pytest.fixture(scope="module")
def parquet_views(spark, tmp_path_factory):
    """The view DAG over PARQUET-backed silver tables (the deployment
    shape) — temp views over in-memory frames can't prove pushdown."""
    import json

    from jobcan_fixtures import make_entities, make_request_docs
    from jobcan_data_integrator_spark import views as V
    from jobcan_data_integrator_spark.operators.entities import (
        ENTITY_APIS,
        parse_entities,
    )
    from jobcan_data_integrator_spark.operators.shred import (
        parse_request_documents,
        shred_request_documents,
    )

    root = tmp_path_factory.mktemp("plan_silver")
    raw = spark.createDataFrame([(d,) for d in make_request_docs(6)], "raw string")
    tables = shred_request_documents(parse_request_documents(raw))
    for api, records in make_entities(6).items():
        ddl, shred = ENTITY_APIS[api]
        shredded = shred(
            parse_entities(
                spark.createDataFrame([(r,) for r in records], "raw string"), ddl
            )
        )
        tables.update(shredded if isinstance(shredded, dict) else {api: shredded})
    parquet_tables = {}
    for name, df in tables.items():
        path = str(root / name)
        df.coalesce(1).write.parquet(path)
        parquet_tables[name] = spark.read.parquet(path)
    V.register_views(spark, parquet_tables)
    return spark


def test_csv_view_form_filter_pushes_to_scan(parquet_views):
    """The 書式 CSV views filter on hard-coded form_ids; that predicate
    must reach the requests parquet scan as a pushed filter so partition
    /row-group pruning works at 100 TB."""
    spark = parquet_views
    df = spark.table("`view_立替精算(書式3)`")
    plan = _plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "form_id" in pushed, f"form_id filter not pushed: {pushed[:200]}"


def test_form_items_view_join_broadcasts(parquet_views):
    """view_form_items joins customized_items to requests — the small
    side must broadcast, not shuffle both inputs."""
    spark = parquet_views
    plan = _plan(spark.table("view_form_items"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_view_dag_has_no_cartesians(parquet_views):
    spark = parquet_views
    from jobcan_data_integrator_spark import views as V

    for name, _ in V.VIEWS:
        plan = _plan(spark.table(f"`{name}`"))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_shard_packing_has_no_global_window(spark, sf_dir):
    """The prefix sum must run per-bucket (parallel), never as a
    single-partition global window — the textbook running-sum trap."""
    plan = _gate_plan(spark, sf_dir, "tx_shard_packing")
    # formatted mode splits node and arguments onto separate lines, so
    # match the argument itself — "Exchange SinglePartition" (simple-mode
    # spelling) never appears and would make this check vacuous
    assert "SinglePartition" not in plan, "global window detected"
    assert "Window" in plan  # the per-bucket running sum is still a window
