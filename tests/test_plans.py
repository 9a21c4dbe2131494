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
