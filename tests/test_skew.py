"""Salting helpers: result-equality with the unsalted plan, and the plan
shape (two exchanges for the two-phase aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a long tail
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    return hot.unionByName(tail).cache()


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        tuple(r)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("v").alias("n"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            skewed,
            ["k"],
            {"sum_v": ("v", "sum"), "n": ("v", "count"), "max_v": ("v", "max")},
        ).collect()
    }
    assert salted == plain


def test_salted_agg_plan_has_two_phases(spark, skewed):
    df = salted_agg(skewed, ["k"], {"n": ("v", "count")})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2  # partial (k, salt) + final (k)


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "big co"), ("t1", "tail co")], "k string, label string"
    )
    plain = {
        tuple(r)
        for r in skewed.join(dim, "k").select("k", "v", "label").collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(skewed, dim, on=["k"])
        .select("k", "v", "label")
        .collect()
    }
    assert salted == plain
    # row counts preserved under the hot key (no dup/loss from salting)
    assert len([r for r in salted_join(skewed, dim, on=["k"]).collect() if r["k"] == "HOT"]) == 9000


def test_salted_join_null_keys_never_match(spark):
    """salted_join advertises plain-join semantics: NULL join keys match
    nothing (the eqNullSafe variant would pair NULLs with NULLs)."""
    big = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "k string, v int"
    )
    other = spark.createDataFrame(
        [("a", "x"), (None, "nullrow")], "k string, label string"
    )
    plain = {
        tuple(r) for r in big.join(other, "k").select("k", "v", "label").collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(big, other, on=["k"]).select("k", "v", "label").collect()
    }
    assert salted == plain == {("a", 1, "x")}
