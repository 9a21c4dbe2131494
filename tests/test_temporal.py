"""As-of and range joins (operators/temporal.py) vs DuckDB.

DuckDB ships a NATIVE ``ASOF JOIN`` — the oracle is the real operator,
not a replica — and the range join is oracled against a plain
inequality join.  Plans are pinned shuffle-shaped: no
BroadcastNestedLoopJoin, no CartesianProduct.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.temporal import asof_join, range_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


QUOTES = [  # (sym_id, ts, px)
    (1, _ts(0), 10.0),
    (1, _ts(5), 11.0),
    (1, _ts(20), 12.0),
    (2, _ts(3), 100.0),
    (3, _ts(50), 7.0),  # only AFTER all of sym 3's trades
]
TRADES = [  # (trade_id, sym_id, ts, qty)
    (0, 1, _ts(0), 5),    # tie: equal timestamps match
    (1, 1, _ts(7), 2),
    (2, 1, _ts(30), 9),
    (3, 2, _ts(2), 1),    # before any quote -> no match
    (4, 2, _ts(59), 4),
    (5, 3, _ts(10), 8),   # backward: none; forward: the _ts(50) quote
]


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        QUOTES, "sym_id bigint, ts timestamp, px double"
    )
    trades = spark.createDataFrame(
        TRADES, "trade_id bigint, sym_id bigint, ts timestamp, qty bigint"
    )
    return trades, quotes


def _duck_asof(direction="backward", tolerance=None):
    con = duckdb.connect()
    con.execute(
        "create table trades(trade_id bigint, sym_id bigint, ts timestamp, qty bigint)"
    )
    con.execute(
        "create table quotes(sym_id bigint, ts timestamp, px double)"
    )
    con.executemany("insert into trades values (?,?,?,?)", TRADES)
    con.executemany("insert into quotes values (?,?,?)", QUOTES)
    op = ">=" if direction == "backward" else "<="
    # DuckDB allows ONE asof inequality; tolerance is a post-filter
    # nulling matches staler than the bound (same as our operator)
    ok = "true"
    if tolerance is not None:
        ok = f"abs(epoch(t.ts) - epoch(q.ts)) <= {tolerance * 60}"
    rows = con.execute(
        f"""
        select t.trade_id, t.sym_id, t.ts, t.qty,
               case when {ok} then q.ts end,
               case when {ok} then q.px end
        from trades t asof left join quotes q
          on t.sym_id = q.sym_id and t.ts {op} q.ts
        order by t.trade_id
        """
    ).fetchall()
    con.close()
    return rows


def _spark_rows(df):
    return [
        (r.trade_id, r.sym_id, r.ts, r.qty, r.right_ts, r.px)
        for r in df.orderBy("trade_id").collect()
    ]


def test_asof_backward_matches_duckdb(spark, frames):
    trades, quotes = frames
    got = _spark_rows(asof_join(trades, quotes, key="sym_id"))
    assert got == _duck_asof("backward")
    # spot semantics: tie matched, pre-first-quote row unmatched
    by_id = {g[0]: g for g in got}
    assert by_id[0][5] == 10.0
    assert by_id[3][5] is None
    assert by_id[5][5] is None


def test_asof_forward_matches_duckdb(spark, frames):
    trades, quotes = frames
    got = _spark_rows(
        asof_join(trades, quotes, key="sym_id", direction="forward")
    )
    assert got == _duck_asof("forward")
    assert {g[0]: g for g in got}[5][5] == 7.0  # sym 3 future quote


def test_asof_tolerance(spark, frames):
    trades, quotes = frames
    got = _spark_rows(
        asof_join(trades, quotes, key="sym_id", tolerance_ms=10 * 60 * 1000)
    )
    assert got == _duck_asof("backward", tolerance=10)
    # trade 2 at minute 30: nearest quote minute 20 -> within 10 min,
    # trade 4 at minute 59: nearest quote minute 3 -> nulled
    by_id = {g[0]: g for g in got}
    assert by_id[2][5] == 12.0
    assert by_id[4][5] is None


def test_asof_plan_single_shuffle_no_nlj(spark, frames):
    trades, quotes = frames
    plan = (
        asof_join(trades, quotes, key="sym_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BroadcastNestedLoop", "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan, plan
    # union + one keyed window: exchanges only hash-partition on _k
    assert plan.count("Exchange hashpartitioning") <= 2, plan


INTERVALS = [  # (campaign, sym_id, start, end)
    ("a", 1, _ts(0), _ts(10)),
    ("b", 1, _ts(6), _ts(31)),   # overlaps a
    ("c", 2, _ts(0), _ts(5)),
    ("d", 3, _ts(40), _ts(55)),
]


def test_range_join_matches_inequality_oracle(spark, frames):
    trades, _ = frames
    iv = spark.createDataFrame(
        INTERVALS,
        "campaign string, sym_id bigint, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r.trade_id, r.campaign)
        for r in range_join(
            trades, iv, fact_time="ts", key="sym_id", band_seconds=300
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create table trades(trade_id bigint, sym_id bigint, ts timestamp, qty bigint)"
    )
    con.execute(
        "create table iv(campaign varchar, sym_id bigint, start_ts timestamp, end_ts timestamp)"
    )
    con.executemany("insert into trades values (?,?,?,?)", TRADES)
    con.executemany("insert into iv values (?,?,?,?)", INTERVALS)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            select t.trade_id, i.campaign from trades t join iv i
            on t.sym_id = i.sym_id
               and t.ts >= i.start_ts and t.ts < i.end_ts
            """
        ).fetchall()
    )
    con.close()
    assert got == want and len(got) >= 4  # incl. the a/b overlap double-hit


def test_range_join_default_band_width(spark, frames):
    trades, _ = frames
    iv = spark.createDataFrame(
        INTERVALS,
        "campaign string, sym_id bigint, start_ts timestamp, end_ts timestamp",
    )
    a = sorted(
        (r.trade_id, r.campaign)
        for r in range_join(trades, iv, key="sym_id").collect()
    )
    b = sorted(
        (r.trade_id, r.campaign)
        for r in range_join(trades, iv, key="sym_id", band_seconds=60).collect()
    )
    assert a == b  # band width never changes the result, only the plan


def test_range_join_plan_is_equi(spark, frames):
    trades, _ = frames
    iv = spark.createDataFrame(
        INTERVALS,
        "campaign string, sym_id bigint, start_ts timestamp, end_ts timestamp",
    )
    plan = (
        range_join(trades, iv, key="sym_id", band_seconds=300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan, plan


def test_asof_on_events_table(spark, sf_dir):
    """Real-table smoke: each error event picks up the most recent
    prior signup of the same user (self as-of)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event")
    )
    out = asof_join(errors, signups, key="user_id")
    rows = out.collect()
    assert len(rows) == errors.count()
    matched = [r for r in rows if r.right_ts is not None]
    assert matched and all(r.right_ts <= r.ts for r in matched)


def test_scd2_from_changelog(spark):
    """SCD2 intervals vs a DuckDB lead() replica, and the composition:
    scd2 -> range_join answers point-in-time attribute lookups."""
    from jobcan_data_integrator_spark.operators.temporal import (
        scd2_from_changelog,
    )

    CHANGES = [  # (user_id, ts, plan)
        (1, _ts(0), "free"),
        (1, _ts(10), "pro"),
        (1, _ts(40), "free"),
        (2, _ts(5), "pro"),
    ]
    ch = spark.createDataFrame(CHANGES, "user_id bigint, ts timestamp, plan string")
    dim = scd2_from_changelog(ch, key="user_id")
    got = sorted(
        (r.user_id, r.plan, r.valid_from, r.valid_to, r.is_current)
        for r in dim.collect()
    )
    con = duckdb.connect()
    con.execute("create table ch(user_id bigint, ts timestamp, plan varchar)")
    con.executemany("insert into ch values (?,?,?)", CHANGES)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            select user_id, plan, ts,
                   coalesce(lead(ts) over (partition by user_id order by ts),
                            timestamp '9999-12-31 23:59:59'),
                   lead(ts) over (partition by user_id order by ts) is null
            from ch
            """
        ).fetchall()
    )
    con.close()
    assert got == want

    # composition: point-in-time lookups through range_join
    lookups = spark.createDataFrame(
        [(100, 1, _ts(15)), (101, 1, _ts(45)), (102, 2, _ts(6))],
        "q bigint, user_id bigint, ts timestamp",
    )
    out = {
        r.q: r.plan
        for r in range_join(
            lookups,
            dim,
            fact_time="ts",
            start_col="valid_from",
            end_col="valid_to",
            key="user_id",
            band_seconds=3600,
        ).collect()
    }
    assert out == {100: "pro", 101: "free", 102: "pro"}


def test_asof_broadcast_equals_shuffle_variant(spark, frames):
    """The broadcast formulation is row-for-row identical to the
    union+window one across directions and tolerance settings."""
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_broadcast,
    )

    trades, quotes = frames
    for kwargs in (
        {},
        {"direction": "forward"},
        {"tolerance_ms": 10 * 60 * 1000},
        {"direction": "forward", "tolerance_ms": 5 * 60 * 1000},
    ):
        a = _spark_rows(asof_join(trades, quotes, key="sym_id", **kwargs))
        b = _spark_rows(
            asof_join_broadcast(trades, quotes, key="sym_id", **kwargs)
        )
        assert a == b, kwargs


def test_asof_broadcast_plan_never_shuffles_facts(spark, frames):
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_broadcast,
    )

    trades, quotes = frames
    plan = (
        asof_join_broadcast(trades, quotes, key="sym_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan, plan
    # fact side stays unshuffled and unsorted: the union+window
    # variant's Window/Sort nodes must be absent, and the single
    # hashpartitioning exchange belongs to the right-side groupBy
    assert "Window" not in plan and "Sort " not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_asof_null_timestamps_never_match(spark):
    """Null right times must not be carried forward as a 'most recent'
    match, and null left times come back unmatched (DuckDB/pandas asof
    semantics)."""
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_broadcast,
    )

    quotes = spark.createDataFrame(
        [(1, None, 999.0), (1, _ts(5), 11.0)],
        "sym_id bigint, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(0, 1, _ts(1), 5), (1, 1, _ts(9), 2), (2, 1, None, 3)],
        "trade_id bigint, sym_id bigint, ts timestamp, qty bigint",
    )
    for fn in (asof_join, asof_join_broadcast):
        for direction in ("backward", "forward"):
            got = {
                r.trade_id: r.px
                for r in fn(
                    trades, quotes, "sym_id", direction=direction
                ).collect()
            }
            # the null-timed quote never matches anything...
            assert 999.0 not in got.values(), (fn.__name__, direction, got)
            # ...and the null-timed trade never matches anything
            assert got[2] is None, (fn.__name__, direction, got)


def test_asof_payload_collision_raises_unless_prefixed(spark, frames):
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_broadcast,
    )

    trades, quotes = frames
    # make the right payload share a left column name
    clash = quotes.withColumnRenamed("px", "qty")
    for fn in (asof_join, asof_join_broadcast):
        with pytest.raises(ValueError, match="collide"):
            fn(trades, clash, "sym_id")
        out = fn(trades, clash, "sym_id", right_prefix="r_")
        assert "r_qty" in out.columns and out.columns.count("qty") == 1
        got = {r.trade_id: r.r_qty for r in out.collect()}
        assert got[1] == 11.0  # trade 1 @ :07 -> quote @ :05


def test_range_join_negative_epochs_floor_consistent(spark):
    """Pre-1970 timestamps: Python // floors while a bigint cast of a
    double division truncates toward zero — mixed semantics dropped
    valid matches.  Oracle: plain inequality join."""
    facts = spark.createDataFrame(
        [(i, dt.datetime(1969, 12, 31, 23, m)) for i, m in enumerate(range(0, 60, 7))],
        "fact_id bigint, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100, dt.datetime(1969, 12, 31, 22, 50), dt.datetime(1969, 12, 31, 23, 20)),
            (101, dt.datetime(1969, 12, 31, 23, 15), dt.datetime(1970, 1, 1, 0, 30)),
        ],
        "iv_id bigint, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.fact_id, r.iv_id)
        for r in range_join(facts, ivs, band_seconds=600).collect()
    }
    want = {
        (r.fact_id, r.iv_id)
        for r in facts.join(
            ivs,
            (facts.ts >= ivs.start_ts) & (facts.ts < ivs.end_ts),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_asof_salted_equals_plain(spark, frames):
    """The hot-key salted variant is row-identical to asof_join across
    directions, tolerance, and band widths that force cross-band
    carries (band=600s on a minute-scale fixture: matches routinely
    live in earlier/later bands)."""
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_salted,
    )

    trades, quotes = frames
    for direction in ("backward", "forward"):
        for tol in (None, 6):
            want = _spark_rows(
                asof_join(
                    trades, quotes, "sym_id",
                    direction=direction,
                    tolerance_ms=None if tol is None else tol * 60_000,
                )
            )
            for band in (60, 600, 10**9):  # tiny, medium, one-band
                got = _spark_rows(
                    asof_join_salted(
                        trades, quotes, "sym_id",
                        band_seconds=band,
                        direction=direction,
                        tolerance_ms=None if tol is None else tol * 60_000,
                    )
                )
                assert got == want, (direction, tol, band)


def test_asof_salted_null_times_and_collision(spark):
    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_salted,
    )

    quotes = spark.createDataFrame(
        [(1, None, 999.0), (1, _ts(5), 11.0)],
        "sym_id bigint, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(0, 1, _ts(1), 5), (1, 1, _ts(9), 2), (2, 1, None, 3)],
        "trade_id bigint, sym_id bigint, ts timestamp, qty bigint",
    )
    got = {
        r.trade_id: r.px
        for r in asof_join_salted(
            trades, quotes, "sym_id", band_seconds=60
        ).collect()
    }
    assert 999.0 not in got.values() and got[2] is None and got[1] == 11.0
    clash = quotes.withColumnRenamed("px", "qty")
    with pytest.raises(ValueError, match="collide"):
        asof_join_salted(trades, clash, "sym_id")


def test_asof_salted_hot_key_plan_partitions_by_band(spark):
    """The big window must partition by (key, band) — never by key
    alone — and still match the plain join on a corpus where one key
    owns ~90% of the facts spread over many bands."""
    import datetime as _dt

    from jobcan_data_integrator_spark.operators.temporal import (
        asof_join_salted,
    )

    base = _dt.datetime(2024, 1, 1)
    facts = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, base + _dt.timedelta(minutes=7 * i)) for i in range(200)],
        "fact_id bigint, k bigint, ts timestamp",
    )
    dims = spark.createDataFrame(
        [(1 if j % 3 else 2, base + _dt.timedelta(minutes=45 * j), float(j)) for j in range(20)],
        "k bigint, ts timestamp, v double",
    )
    salted = asof_join_salted(facts, dims, "k", band_seconds=3600)
    plain = asof_join(facts, dims, "k")
    assert _rows_set(salted) == _rows_set(plain)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # every window partition spec over the fact union carries _band
    import re as _re

    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and any("_band" in s for s in specs), plan[:2000]


def _rows_set(df):
    return {
        tuple(r)
        for r in df.select(
            "fact_id", "k", "ts", "right_ts", "v"
        ).collect()
    }
