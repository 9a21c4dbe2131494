"""Skew mitigation: salting patterns for hot keys (SURVEY.md §4.3 item 5).

AQE's skew-join splitting (on in the session factory) handles most skew
at runtime; these helpers are for the two shapes AQE cannot fix:

- ``salted_agg``: a single hot group overwhelming one reducer during
  aggregation — two-phase aggregate via an explicit salt column;
- ``salted_join``: a hot key in a fact-to-fact join — salt the big side,
  explode the (small) other side across the salt range.

The reference's J9-class join (``create_views.sql:461-462`` — equi-join
on company_name, a non-key) is the canonical candidate: one big payee
company ⇒ one hot partition at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial by (keys..., salt), final by keys.

    ``aggs`` maps output column -> (input column, fn) where fn is an
    ALGEBRAIC function (sum / count / min / max) — the only ones a
    two-phase split is exact for.  count re-aggregates as sum of partial
    counts.  The salt spreads one hot group across ``n_salts`` reducers;
    the final phase touches only |groups| x n_salts rows.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
        refn = "sum" if fn in ("count", "sum") else fn
        final_exprs.append(getattr(F, refn)(f"_p_{out}").alias(out))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the other side replicated.

    The big side gets a random salt in [0, n_salts); the other side is
    exploded across all salts, so every (key, salt) bucket joins locally.
    Use when one key's rows exceed a single task's capacity and AQE's
    skew split cannot apply (e.g. the join is below another exchange).
    Replication multiplies the other side by n_salts — keep it the
    smaller input.

    Key comparison is null-UNSAFE (``=``), matching the plain
    ``big.join(other, on)`` this is a drop-in replacement for: rows with
    a NULL join key never match.
    """
    b = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond: Column = reduce(
        lambda x, y: x & y, ((b[k] == o[k]) for k in on)
    ) & (b["_salt"] == o["_salt"])
    joined = b.join(o, cond, how)
    # drop the salt + the duplicated key columns from the other side
    return joined.drop(o["_salt"]).drop(b["_salt"]).drop(*[o[k] for k in on])
