"""Temporal joins Spark lacks as built-ins — as-of join and
interval/range join — expressed as compositions of existing DataFrame
ops (the brief's preferred strategy for missing operators), never a
theta-join.

``asof_join`` uses the UNION + keyed-window formulation: tag both
sides, union them, sort within each key by (time, side) and carry the
most recent right-side payload forward with ``last(..., ignorenulls)``.
Cost is ONE hash shuffle on the key + a per-key sort — identical shape
to any windowed aggregation, with none of the range-condition
fan-out/skew a join-on-inequality plan has (Spark would pick
SortMergeJoin with a post-filter or, keyless, a nested loop: both
quadratic in the worst case).  At 100 TB this is the difference
between "one shuffle, linear merge" and "unbounded per-key cross
product".

``range_join`` (point-in-interval) uses interval BANDING: each
interval explodes to the fixed-width time bands it overlaps, facts
compute their band in-row, and the join is a plain (band [, key])
equi-join with an exact containment post-filter.  Fan-out is
ceil(interval_len / band_width) rows per interval — bounded and
chosen, not data-driven — and each fact meets only intervals sharing
its band, never the whole table.  The band width defaults to the
average interval length (one tiny aggregate), the textbook balance
between interval replication and per-band candidate count.

Both are DuckDB-oracled in tests/test_temporal.py (DuckDB ships a
native ASOF JOIN — the replica is the real thing) and plan-pinned:
no BroadcastNestedLoopJoin, no CartesianProduct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    tolerance_ms: int | None = None,
    direction: str = "backward",
    right_prefix: str = "",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_time`` <= ``left_time`` (direction='backward'; 'forward'
    takes the smallest >=) within the same ``key`` — the standard
    as-of/point-in-time join (trades, sensor snapshots, SCD lookups).

    Right columns come back with their own names (the key and time
    columns of the right side are ``right_<time>`` to keep the match
    auditable); unmatched left rows keep NULLs.  ``tolerance_ms``
    bounds the allowed staleness: matches older (newer, for forward)
    than the tolerance are nulled out, exactly DuckDB/pandas
    ``tolerance`` semantics.  Ties on equal timestamps match (<=/>=).

    Null timestamps never match (DuckDB/pandas asof semantics): right
    rows with a null ``right_time`` are dropped from the candidate
    set, and left rows with a null ``left_time`` come back unmatched.
    A right payload column sharing a left column's name would emit a
    duplicate ambiguous column — pass ``right_prefix`` to disambiguate
    (``right_prefix="r_"`` renames every right payload column), or the
    collision raises."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload_cols = [
        c for c in right.columns if c not in (key, right_time)
    ]
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash and not right_prefix:
        raise ValueError(
            "right payload columns collide with left columns "
            f"{clash}; pass right_prefix= to rename them"
        )
    # null right_time never matches — with nulls-first ascending window
    # order a null-timed right row would otherwise sort before
    # everything and be carried forward as a bogus "most recent" match
    right = right.filter(F.col(right_time).cast("timestamp").isNotNull())
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_time).cast("timestamp").alias("_rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(r.schema["_payload"].dataType)
        .alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    both = r.unionByName(l)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal time -> <= matches
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = both.withColumn(
        "_m", F.last(F.col("_payload"), ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    # null left_time never matches (in the forward/desc window a null
    # left time sorts LAST and would pick up the oldest right payload)
    matched = matched.withColumn(
        "_m", F.when(F.col("_t").isNotNull(), F.col("_m"))
    )
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_millis(F.col("_t")) - F.unix_millis(F.col("_m._rt"))
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_ms), F.col("_m"))
        )
    out_cols = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ] + [F.col("_m._rt").alias(f"right_{right_time}")] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_time: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key: str | None = None,
    band_seconds: int | None = None,
) -> DataFrame:
    """Inner point-in-interval join: every (fact, interval) pair with
    ``start <= fact_time < end`` (and equal ``key`` when given).

    Banding keeps it an equi-join: intervals explode to the band ids
    they overlap (``sequence`` — in-row, bounded by len/width), facts
    compute one band id, and the exact half-open containment filter
    runs after the hash join.  A fact lands in ONE band, and an
    interval appears once per band it overlaps, so no dedup is needed.
    ``band_seconds`` defaults to the mean interval length (one scalar
    aggregate over the intervals — at 100 TB the intervals table is
    the small side: sessions, campaigns, outage windows)."""
    # facts' band range clamps interval expansion: bands no fact falls
    # in can never produce a match, and without the clamp an OPEN-ENDED
    # interval (SCD2's year-9999 valid_to) would explode to millions of
    # band rows.  min/max over the fact time is one map-side-combined
    # scalar aggregate (parquet column stats make it near-free).
    fb = facts.select(
        F.min(F.unix_timestamp(fact_time)).alias("lo"),
        F.max(F.unix_timestamp(fact_time)).alias("hi"),
    ).first()
    if fb["lo"] is None:
        empty_iv = intervals.limit(0)
        keep0 = [facts[c] for c in facts.columns] + [
            empty_iv[c] for c in intervals.columns if c != key
        ]
        return facts.limit(0).crossJoin(empty_iv).select(*keep0)
    if band_seconds is None:
        # mean CLAMPED interval length (open-ended intervals would
        # otherwise drag the mean - and the band width - to infinity)
        row = intervals.select(
            F.avg(
                F.least(F.unix_timestamp(end_col), F.lit(fb["hi"] + 1))
                - F.greatest(F.unix_timestamp(start_col), F.lit(fb["lo"]))
            ).alias("w")
        ).first()
        band_seconds = max(int(row["w"] or 1), 1)
    band = F.lit(band_seconds)

    # FLOOR division on both the Spark and Python sides (a bigint cast
    # of double division truncates toward zero, which disagrees with
    # Python's // for pre-1970 negative epochs and would clamp out the
    # band a fact actually computes).  (x - pmod(x, band)) is an exact
    # multiple of band and pmod is always non-negative, so the divide
    # is exact and the result is the mathematical floor for any sign.
    def _floor_band(col):
        x = F.unix_timestamp(col).cast("bigint")
        return ((x - F.pmod(x, band)) / band).cast("bigint")

    lo_band, hi_band = fb["lo"] // band_seconds, fb["hi"] // band_seconds
    seq_lo = F.greatest(_floor_band(F.col(start_col)), F.lit(lo_band))
    seq_hi = F.least(_floor_band(F.col(end_col)), F.lit(hi_band))
    iv = intervals.filter(
        (F.unix_timestamp(end_col) >= F.lit(fb["lo"]))
        & (F.unix_timestamp(start_col) <= F.lit(fb["hi"]))
    ).withColumn(
        # guard: an empty clamped range must emit NO bands, not a
        # descending sequence
        "_band",
        F.explode(
            F.when(seq_lo <= seq_hi, F.sequence(seq_lo, seq_hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    fx = facts.withColumn("_band", _floor_band(F.col(fact_time)))
    on = [fx["_band"] == iv["_band"]]
    if key is not None:
        on.append(fx[key] == iv[key])
    joined = fx.join(iv, on, "inner").filter(
        (fx[fact_time] >= iv[start_col]) & (fx[fact_time] < iv[end_col])
    )
    keep = [fx[c] for c in facts.columns] + [
        iv[c] for c in intervals.columns if c != key
    ]
    return joined.select(*keep)


def scd2_from_changelog(
    changes: DataFrame,
    key: str,
    change_time: str = "ts",
    open_end: str = "9999-12-31 23:59:59",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log: each
    (key, attributes) change row becomes a validity interval
    [valid_from, valid_to) closed by the key's NEXT change (``lead``
    over one keyed window; the latest row stays open until
    ``open_end``), plus an ``is_current`` flag.

    The output is exactly what :func:`range_join`/:func:`asof_join`
    consume as the dimension side — changelog -> SCD2 -> point-in-time
    enrichment without ever materializing per-day snapshots.  One hash
    shuffle on the key, same shape as any windowed dedup; late
    replayed duplicates (same key+time) should be dropped upstream
    (``dropDuplicates([key, change_time])``) to keep intervals
    well-formed."""
    w = Window.partitionBy(key).orderBy(F.col(change_time).asc())
    return (
        changes.withColumn(
            "valid_from", F.col(change_time).cast("timestamp")
        )
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead(F.col(change_time).cast("timestamp")).over(w),
                F.lit(open_end).cast("timestamp"),
            ),
        )
        .withColumn(
            "is_current", F.col("valid_to") == F.lit(open_end).cast("timestamp")
        )
        .drop(change_time)
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    band_seconds: int = 86400,
    tolerance_ms: int | None = None,
    direction: str = "backward",
    right_prefix: str = "",
) -> DataFrame:
    """:func:`asof_join` with HOT-KEY salting — the variant for a key
    that owns an unbounded share of the facts (one symbol with half the
    trades, one tenant with half the events), where the plain
    union+keyed-window plan serializes that key's entire history into a
    single task's sort.

    Time-banded salting: rows additionally partition by
    ``floor(time / band_seconds)``, so the big window sorts one (key,
    band) slice per task — the hot key's history spreads across its
    bands, and task size is bounded by events-per-band, a knob, not by
    key popularity.  Cross-band carry: an in-band match can miss a
    right row from an EARLIER band (backward; later for forward), so a
    per-(key, band) aggregate keeps each band's latest (earliest)
    right payload — #(key, band) rows, events-per-band times smaller
    than the fact table — and a keyed window over THAT small frame
    carries payloads across band boundaries (the hot key again
    serializes, but over its band count, not its event count).  The
    in-band match wins when present; the carry fills the rest.

    Row-identical to :func:`asof_join` for every direction / tolerance
    / null combination (pinned in tests/test_temporal.py), including
    tie behavior: ties happen at equal timestamps, which always share
    a band.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if band_seconds < 1:
        raise ValueError(f"band_seconds must be >= 1: {band_seconds}")
    payload_cols = [c for c in right.columns if c not in (key, right_time)]
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash and not right_prefix:
        raise ValueError(
            "right payload columns collide with left columns "
            f"{clash}; pass right_prefix= to rename them"
        )
    right = right.filter(F.col(right_time).cast("timestamp").isNotNull())
    band = F.lit(band_seconds)

    def _band_of(col):
        x = F.unix_timestamp(col.cast("timestamp")).cast("bigint")
        return ((x - F.pmod(x, band)) / band).cast("bigint")

    payload_t = F.struct(
        F.col(right_time).cast("timestamp").alias("_rt"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        payload_t.alias("_payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    both = r.unionByName(l).withColumn("_band", _band_of(F.col("_t")))

    if direction == "backward":
        w_in = (
            Window.partitionBy("_k", "_band")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        agg_pick = F.max  # latest right payload of each band
    else:
        w_in = (
            Window.partitionBy("_k", "_band")
            .orderBy(F.col("_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        agg_pick = F.min  # earliest right payload of each band

    matched = both.withColumn(
        "_m", F.last(F.col("_payload"), ignorenulls=True).over(w_in)
    ).filter(F.col("_side") == 1)

    # cross-band carry: per (key, band) boundary payload (struct max/min
    # orders by _rt first — exactly the latest/earliest right row), then
    # one keyed window over this SMALL band-level frame carries it
    # across bands.  Fact bands with no right rows still need a carry
    # row, so the fact side's distinct (key, band) pairs ride along as
    # null-edge markers; the RANGE frame ending at -1 excludes the
    # CURRENT band entirely (same-band right rows are the in-band
    # window's job — a same-band edge may postdate a fact and must not
    # leak in) while covering every strictly-prior band.
    edges = (
        r.withColumn("_band", _band_of(F.col("_t")))
        .groupBy("_k", "_band")
        .agg(agg_pick("_payload").alias("_edge"))
    )
    markers = (
        matched.select("_k", "_band")
        .distinct()
        .withColumn("_edge", F.lit(None).cast(r.schema["_payload"].dataType))
    )
    sign = 1 if direction == "backward" else -1
    eu = edges.unionByName(markers).withColumn(
        "_ord", (F.col("_band") * sign).cast("bigint")
    )
    w_carry = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ord").asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        eu.withColumn(
            "_carry", F.last(F.col("_edge"), ignorenulls=True).over(w_carry)
        )
        .select("_k", "_band", "_carry")
        .distinct()  # one row per band (every row of a band sees the same carry)
    )

    matched = matched.join(carry, ["_k", "_band"], "left").withColumn(
        "_m",
        F.when(F.col("_t").isNull(), F.lit(None).cast(r.schema["_payload"].dataType))
        .otherwise(F.coalesce(F.col("_m"), F.col("_carry"))),
    )
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_millis(F.col("_t")) - F.unix_millis(F.col("_m._rt"))
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_ms), F.col("_m"))
        )
    out_cols = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ] + [F.col("_m._rt").alias(f"right_{right_time}")] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    tolerance_ms: int | None = None,
    direction: str = "backward",
    right_prefix: str = "",
) -> DataFrame:
    """:func:`asof_join` for a SMALL right side — the 100 TB scale path
    when the dimension fits in a broadcast (quotes-per-symbol, config
    snapshots, SCD2 dims): the right side collapses to one row per key
    holding its time-sorted (time, payload) array, that tiny table is
    broadcast-hash-joined onto the facts, and the match is an in-row
    ``filter`` + last/first element.  The fact table is NEVER shuffled
    or sorted — the plan is scan -> BHJ -> project, fully narrow,
    where :func:`asof_join` pays one hash exchange + per-key sort over
    the combined volume.

    Semantics are identical to :func:`asof_join` (tie-inclusive,
    backward/forward, tolerance nulls stale matches) — pinned
    row-for-row against it in tests/test_temporal.py."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload_cols = [c for c in right.columns if c not in (key, right_time)]
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash and not right_prefix:
        raise ValueError(
            "right payload columns collide with left columns "
            f"{clash}; pass right_prefix= to rename them"
        )
    # null right_time never matches — mirrors asof_join
    right = right.filter(F.col(right_time).cast("timestamp").isNotNull())
    rg = right.groupBy(key).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(right_time).cast("timestamp").alias("_rt"),
                    *[F.col(c) for c in payload_cols],
                )
            )
        ).alias("_rts")
    )
    lt = F.col(left_time).cast("timestamp")
    if direction == "backward":
        cand = F.filter(F.col("_rts"), lambda s: s["_rt"] <= lt)
        pick = F.element_at(cand, -1)
    else:
        cand = F.filter(F.col("_rts"), lambda s: s["_rt"] >= lt)
        pick = F.element_at(cand, 1)
    m = F.when(F.size(cand) > 0, pick)
    if tolerance_ms is not None:
        gap = F.abs(F.unix_millis(lt) - F.unix_millis(m["_rt"]))
        m = F.when(gap <= F.lit(tolerance_ms), m)
    joined = left.join(F.broadcast(rg), key, "left")
    return joined.select(
        *[F.col(c) for c in left.columns],
        m["_rt"].alias(f"right_{right_time}"),
        *[m[c].alias(f"{right_prefix}{c}") for c in payload_cols],
    )
