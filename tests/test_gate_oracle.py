"""Mimic the driver's correctness gate: run every registered gate query in
Spark AND its DuckDB oracle on the same parquet tables, then compare
row-count + column names + sorted values exactly.

Exact comparison (not approx) on purpose — the driver hashes values, so any
float divergence we would tolerate here would fail there.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from jobcan_data_integrator_spark.gate import REGISTRY, _ensure_loaded
from jobcan_data_integrator_spark.session import TESTDATA_TABLES

_ensure_loaded()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows(cols, records):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(repr(_norm(r[i])) for i in idx) for r in records),
    )


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_gate_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, sf_dir)
    s_cols = sdf.columns
    s_recs = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    d_cols = [d[0] for d in res.description]
    d_recs = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_recs) == len(d_recs), f"{name}: row counts differ"
    srt, drt = _rows(s_cols, s_recs), _rows(d_cols, d_recs)
    mismatches = [(a, b) for a, b in zip(srt, drt) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"


def test_every_gate_has_a_value_oracle():
    # The registry carries NO rows-only gate: every driver row is a full
    # rows+schema+hash check.  Adding an oracle-less gate silently
    # downgrades its evidence — do it consciously (and bring back a
    # rows-only test) or give it an oracle.
    assert sorted(REGISTRY) == ORACLE_QUERIES


#: j1 was rotated out of the 50-row driver registry (its slot carries
#: dd_incremental_dedup now) but keeps the SAME dual-engine value golden
#: here so the J1 evidence never regresses.
_J1_ORACLE = """
    SELECT c.c_custkey, c.c_name,
           n.n_name AS nation_name, r.r_name AS region_name,
           CASE c.c_mktsegment
                WHEN 'BUILDING' THEN '建築' WHEN 'AUTOMOBILE' THEN '自動車'
                WHEN 'MACHINERY' THEN '機械' WHEN 'HOUSEHOLD' THEN '家庭'
                ELSE c.c_mktsegment END AS segment_jp,
           c.c_acctbal AS acctbal,
           CASE WHEN c.c_acctbal < 0 THEN 'negative' ELSE 'ok' END AS acctbal_flag
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def test_j1_customer_details_golden(spark, sf_dir):
    from jobcan_data_integrator_spark.gate.analytic import j1_customer_details

    sdf = j1_customer_details(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_J1_ORACLE)
    d_cols = [d[0] for d in res.description]
    d_recs = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, d_recs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


_F_CURRENCY_ORACLE = """
    SELECT p_partkey,
           format('{:,}', CAST(floor(p_retailprice) AS BIGINT)) || ' 円' AS amount_str,
           CAST(regexp_replace(format('{:,}', CAST(floor(p_retailprice) AS BIGINT)) || ' 円',
                               '[円, ]', '', 'g') AS BIGINT) AS amount_yen
    FROM part
"""


def test_f_currency_roundtrip_golden(spark, sf_dir):
    """f_currency_roundtrip rotated out of the driver registry in round
    7 (slot given to ig_retract): the dual-engine value golden lives on
    here, unchanged."""
    from jobcan_data_integrator_spark.gate.analytic import (
        f_currency_roundtrip,
    )

    sdf = f_currency_roundtrip(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_F_CURRENCY_ORACLE)
    d_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, res.fetchall())


_N_REPEAT_ORACLE = """
    SELECT s.s_suppkey, g.i AS copy_idx, s.s_name
    FROM supplier s JOIN generate_series(0, 2) AS g(i) ON g.i <= s.s_suppkey % 3
"""


def test_n_repeat_rows_golden(spark, sf_dir):
    """n_repeat_rows rotated out of the driver registry in round 8
    (slot given to rt_bm25_topk): the dual-engine value golden lives on
    here, unchanged."""
    from jobcan_data_integrator_spark.gate.analytic import n_repeat_rows

    sdf = n_repeat_rows(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_N_REPEAT_ORACLE)
    d_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, res.fetchall())


_J10_ORACLE = """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def test_j10_anti_join_golden(spark, sf_dir):
    """J10 rotated out of the driver registry in round 5 (slot given to
    ig_incremental_curation): the dual-engine golden on the generated
    tables, PLUS a crafted orphan-customer fixture that actually
    exercises the anti-join's non-empty side (the generator gives every
    customer an order, so the driver row compared 0 == 0)."""
    from pyspark.sql import functions as F

    from jobcan_data_integrator_spark.gate.analytic import j10_anti_join

    sdf = j10_anti_join(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_J10_ORACLE)
    assert sorted(sdf.columns) == sorted([d[0] for d in res.description])
    assert _rows(sdf.columns, s_recs) == _rows(
        [d[0] for d in res.description], res.fetchall()
    )

    # crafted orphans: customers 900001/900002 have no orders
    c = spark.createDataFrame(
        [(900001, "orphan-a"), (900002, "orphan-b"), (1, "has-orders")],
        "c_custkey bigint, c_name string",
    )
    o = spark.createDataFrame([(10, 1)], "o_orderkey bigint, o_custkey bigint")
    got = sorted(
        r.c_custkey
        for r in c.join(o, c.c_custkey == o.o_custkey, "left_anti").collect()
    )
    assert got == [900001, 900002]


_J11_ORACLE = """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
"""


def test_j11_semi_join_golden(spark, sf_dir):
    """J11 rotated out of the driver registry in round 8 (slot given to
    rt_hybrid_rrf): the dual-engine value golden lives on here,
    unchanged."""
    from jobcan_data_integrator_spark.gate.analytic import j11_semi_join

    sdf = j11_semi_join(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_J11_ORACLE)
    d_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, res.fetchall())


_F_DATE_ORACLE = """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y/%m/%d  %H:%M:%S') AS order_date_utc,
           strftime(o_orderdate + INTERVAL 9 HOUR, '%Y/%m/%d  %H:%M:%S') AS order_date_jst
    FROM orders
"""


def test_f_date_format_golden(spark, sf_dir):
    """f_date_format_jst rotated out of the driver registry in round 9
    (slot given to ig_probe): the dual-engine value golden lives on
    here, unchanged."""
    from jobcan_data_integrator_spark.gate.analytic import f_date_format_jst

    sdf = f_date_format_jst(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_F_DATE_ORACLE)
    d_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, res.fetchall())


_TX_CONTAM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(tok || ' ' || lead(tok, 1) OVER w || ' '
                                 || lead(tok, 2) OVER w), 1, 15))::BIGINT AS shingle
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    )
    SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_hits
    FROM sh c JOIN sh b ON c.shingle = b.shingle
    WHERE b.doc_id < 5 AND c.doc_id >= 5
    GROUP BY c.doc_id, b.doc_id
    HAVING count(*) >= 3
"""


def test_tx_contamination_golden(spark, sf_dir):
    """tx_contamination rotated out of the driver registry in round 10
    (slot given to ig_contamination, the index-served verdict): the
    stateless-sweep dual-engine value golden lives on here, unchanged."""
    from jobcan_data_integrator_spark.gate.llm import tx_contamination

    sdf = tx_contamination(spark, sf_dir)
    s_recs = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(_TX_CONTAM_ORACLE)
    d_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _rows(sdf.columns, s_recs) == _rows(d_cols, res.fetchall())
