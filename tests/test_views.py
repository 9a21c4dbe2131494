"""Golden tests for the gold view layer (SURVEY.md §2.4-§2.8, M4).

Every view from reference ``config/create_views.sql`` is rendered twice
from the same definition — Spark SQL and DuckDB SQL — and executed over
the SAME silver tables (shredded from the synthetic fixtures).  Results
must match row-for-row, which pins the deterministic semantics we chose
for SQLite's nondeterministic corners (bare GROUP BY, GROUP_CONCAT
order) to one answer on two independent engines.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from jobcan_fixtures import make_entities, make_request_docs
from jobcan_data_integrator_spark import views as V
from jobcan_data_integrator_spark.operators.entities import ENTITY_APIS, parse_entities
from jobcan_data_integrator_spark.operators.shred import (
    parse_request_documents,
    shred_request_documents,
)

N_DOCS = 24

#: views whose form_id filters the fixture pool can't populate are still
#: required to parse + execute on both engines (may be empty).
MAY_BE_EMPTY = set()


@pytest.fixture(scope="module")
def silver(spark):
    raw_df = spark.createDataFrame([(d,) for d in make_request_docs(N_DOCS)], "raw string")
    tables = shred_request_documents(parse_request_documents(raw_df))
    for api, records in make_entities(N_DOCS).items():
        ddl, shred = ENTITY_APIS[api]
        parsed = parse_entities(
            spark.createDataFrame([(r,) for r in records], "raw string"), ddl
        )
        shredded = shred(parsed)
        if isinstance(shredded, dict):
            tables.update(shredded)
        else:
            tables[api] = shredded
    # cache: every view references the same handful of silver tables
    return {name: df.cache() for name, df in tables.items()}


@pytest.fixture(scope="module")
def engines(spark, silver):
    V.register_views(spark, silver)
    con = duckdb.connect()
    for name, df in silver.items():
        con.register(name, df.toArrow())
    for name, _ in V.VIEWS:
        con.execute(f'CREATE VIEW "{name}" AS {V.view_sql(name, V.DUCKDB)}')
    yield spark, con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v.is_integer():
            return int(v)
        return round(v, 9)
    return v


def _canon(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name", [n for n, _ in V.VIEWS])
def test_view_matches_duckdb(engines, name):
    spark, con = engines
    sdf = spark.sql(f"SELECT * FROM `{name}`")
    got = _canon(sdf.columns, sdf.collect())
    rel = con.execute(f'SELECT * FROM "{name}"')
    cols = [d[0] for d in rel.description]
    exp = _canon(cols, rel.fetchall())
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in cols)
    if name not in MAY_BE_EMPTY:
        assert got, f"{name} returned no rows on the fixture data"
    assert got == exp, f"{name}: first spark row {got[:1]} vs duckdb {exp[:1]}"
