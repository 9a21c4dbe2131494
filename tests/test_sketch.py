"""HLL + Count-Min sketches (operators/sketch.py): DuckDB bit-exact
table replays, accuracy bounds vs exact answers, mergeability."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.sketch import (
    cms_lookup,
    cms_table,
    hll_count_distinct,
    hll_estimate,
    hll_registers,
)
from jobcan_data_integrator_spark.session import load_table

# The HLL register table: same bucket/remainder split, rank from the
# binary string length (DuckDB bin() of a BIGINT keeps leading zeros of
# the fixed 64-bit width, so trim them with the %b-style cast via
# ltrim('0'); NULLIF guards the v=0 row, whose bin is all zeros).
_HLL_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM read_parquet('{path}')
), h AS (
  SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
), split AS (
  SELECT CAST(h % {m} AS INT) AS bucket, h // {m} AS v FROM h
), ranked AS (
  SELECT bucket,
         CASE WHEN v = 0 THEN 51
              ELSE 51 - length(ltrim(bin(v), '0')) END AS rank
  FROM split
)
SELECT bucket, CAST(max(rank) AS INT) AS r
FROM ranked GROUP BY bucket ORDER BY bucket
"""

_CMS_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM read_parquet('{path}')
), cells AS (
  SELECT i AS row,
         CAST(('0x' || substr(md5('cms' || CAST(i AS VARCHAR) || '|' || tok),
                              1, 15))::BIGINT % {w} AS INT) AS bucket
  FROM toks CROSS JOIN (SELECT unnest(range(0, {d})) AS i)
)
SELECT row, bucket, CAST(count(*) AS BIGINT) AS c
FROM cells GROUP BY 1, 2 ORDER BY 1, 2
"""


def _tokens(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )


def test_hll_registers_match_duckdb(spark, sf_dir):
    got = [
        (r.bucket, r.r)
        for r in hll_registers(_tokens(spark, sf_dir), "tok")
        .orderBy("bucket")
        .collect()
    ]
    want = duckdb.sql(
        _HLL_ORACLE.format(path=f"{sf_dir}/documents.parquet", m=1024)
    ).fetchall()
    assert got == [(b, r) for b, r in want]


def test_hll_estimate_within_error_bound(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    true = toks.select("tok").distinct().count()
    est = hll_count_distinct(toks, "tok")
    # 1.04/sqrt(1024) ~ 3.3% standard error; allow 4 sigma
    assert abs(est - true) / true < 0.13


def test_hll_merge_equals_whole(spark, sf_dir):
    toks = _tokens(spark, sf_dir).withColumn(
        "half", (F.crc32("tok") % 2).cast("int")
    )
    whole = {
        (r.bucket, r.r) for r in hll_registers(toks, "tok").collect()
    }
    a = hll_registers(toks.filter("half = 0"), "tok")
    b = hll_registers(toks.filter("half = 1"), "tok")
    merged = {
        (r.bucket, r.r)
        for r in a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .collect()
    }
    assert merged == whole


def test_hll_estimate_small_range_exactish(spark):
    # linear-counting branch: tiny cardinalities come out near-exact
    df = spark.range(200).select(F.concat(F.lit("v"), "id").alias("x"))
    est = hll_count_distinct(df, "x")
    assert abs(est - 200) < 10


def test_hll_estimate_handles_full_registers():
    # all buckets at rank 0 absent; all present at some rank -> no zeros
    assert hll_estimate([(j, 1) for j in range(1024)], 1024) > 0


def test_cms_table_matches_duckdb(spark, sf_dir):
    got = [
        (r.row, r.bucket, r.c)
        for r in cms_table(_tokens(spark, sf_dir), "tok")
        .orderBy("row", "bucket")
        .collect()
    ]
    want = duckdb.sql(
        _CMS_ORACLE.format(path=f"{sf_dir}/documents.parquet", d=4, w=1024)
    ).fetchall()
    assert got == [(r, b, c) for r, b, c in want]


def test_cms_lookup_bounds(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    exact = toks.groupBy("tok").count()
    top = exact.orderBy(F.desc("count"), "tok").limit(20)
    cms = cms_table(toks, "tok")
    est = cms_lookup(top.select("tok"), cms, "tok")
    joined = est.join(top, "tok").collect()
    assert len(joined) == 20
    n = toks.count()
    for r in joined:
        assert r.est >= r["count"]  # never undercounts
        # e/width overestimate bound (loose deterministic check)
        assert r.est <= r["count"] + 0.02 * n


def test_cms_lookup_unseen_value_is_small(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    cms = cms_table(toks, "tok")
    probe = toks.sparkSession.createDataFrame(
        [("@@never-a-token@@",)], "tok string"
    )
    [r] = cms_lookup(probe, cms, "tok").collect()
    # unseen values may collide into occupied cells but stay under the
    # epsilon*N bound
    assert r.est <= 0.02 * toks.count()


def test_hll_non_default_m_is_unbiased(spark):
    """The rank base derives from m — with the old hardcoded 51 an
    m=4096 sketch read ~4x high (the remainder field is 2 bits shorter
    per factor-of-4 in m)."""
    df = spark.range(20000).select(F.concat(F.lit("v"), "id").alias("x"))
    for m, tol in [(256, 0.30), (4096, 0.10)]:
        est = hll_count_distinct(df, "x", m=m)
        assert abs(est - 20000) / 20000 < tol, (m, est)


def test_hll_registers_rank_range_scales_with_m(spark):
    df = spark.range(5000).select(F.concat(F.lit("v"), "id").alias("x"))
    for m, maxrank in [(1024, 51), (4096, 49)]:
        regs = hll_registers(df, "x", m=m).collect()
        assert all(1 <= r.r <= maxrank for r in regs), (m, regs[:5])


def test_hll_rejects_non_power_of_two_m(spark):
    import pytest

    df = spark.range(10).select(F.concat(F.lit("v"), "id").alias("x"))
    with pytest.raises(ValueError, match="power of two"):
        hll_registers(df, "x", m=1000)
    with pytest.raises(ValueError, match="power of two"):
        hll_estimate([], m=12)
