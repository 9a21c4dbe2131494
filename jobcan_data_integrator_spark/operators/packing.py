"""Training-shard packing: assign documents to contiguous token-budget
shards — the step between corpus curation and training-data writing.

Semantics: documents in deterministic ``doc_id`` order; ``cum_before`` =
total tokens of all earlier documents; ``shard_id = cum_before div
budget``.  Shard boundaries fall at budget multiples of the prefix sum,
so every shard holds ~budget tokens (the straddling document goes to
the earlier shard — the usual greedy fill).

Scale shape — a global running sum is the textbook single-partition
window trap, so this is the two-pass distributed prefix sum instead:

1. bucket documents by ``doc_id div bucket_size`` (pure map);
2. per-bucket token totals (map-side partial agg to n/bucket_size rows)
   are collected and prefix-summed DRIVER-side — tiny by construction
   (choose bucket_size so this is ~thousands of rows at any corpus
   size), then broadcast back as per-bucket offsets;
3. the running sum runs as a window PARTITIONED BY bucket (parallel
   across buckets) plus the bucket's offset.

No Exchange SinglePartition anywhere (tests/test_plans.py pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hard cap on the driver-side per-bucket offset list.  The default
#: bucket_size derivation bounds the list at ~4096 rows regardless of
#: corpus size; an explicit caller-supplied ``bucket_size`` could defeat
#: that bound (range/bucket_size rows collect to the driver), so the
#: count is checked BEFORE the collect and the call fails loudly instead
#: of melting the driver.
_MAX_BUCKETS = 100_000


def pack_shards(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_size: int | None = None,
    shuffle_salt: str | None = None,
) -> DataFrame:
    """(id, n_tokens, cum_before, shard_id) for ``docs`` with an integer
    id column and a per-document token count.

    ``bucket_size`` defaults to order-key-range/4096 (one tiny min/max
    agg), so the driver-side offset list is bounded at ~4096 rows
    REGARDLESS of corpus size — a fixed small default would collect
    n/256 rows and melt the driver at billions of documents.  NULL token
    counts count as 0.

    ``shuffle_salt``: training pipelines pack documents in a SHUFFLED
    order, not ingestion order (sequential shards of a sorted corpus
    concentrate one source/time-slice per shard).  Passing a salt packs
    by the deterministic pseudorandom order ``md5(salt | id)`` — a
    reproducible permutation with no RNG state, re-shufflable per epoch
    by changing the salt.  The prefix sum machinery is unchanged: the
    order key's range replaces the id range for bucketing, so the
    driver-side offset list stays ~4096 rows.
    """
    if shuffle_salt is None:
        order_col = F.col(id_col)
    else:
        # 60-bit md5-derived order key (collisions broken by id below)
        order_col = F.expr(
            "cast(conv(substr(md5(concat("
            f"'{shuffle_salt}', '|', cast({id_col} as string))), 1, 15), 16, 10)"
            " as bigint)"
        )
    # three consumers (range agg, per-bucket totals, the final window)
    # would each re-evaluate the upstream plan + the md5 order key;
    # checkpoint the narrow 3-column projection once (GC-reclaimed)
    b = (
        docs.select(id_col, tokens_col)
        .withColumn("_ord", order_col)
        .localCheckpoint(eager=False)
    )
    if bucket_size is None:
        lo, hi = b.agg(F.min("_ord"), F.max("_ord")).collect()[0]
        span = (hi - lo + 1) if hi is not None else 1
        bucket_size = max(1, span // 4096)
    else:
        lo, hi = b.agg(F.min("_ord"), F.max("_ord")).collect()[0]
        span = (hi - lo + 1) if hi is not None else 1
        n_buckets = (span + bucket_size - 1) // bucket_size
        if n_buckets > _MAX_BUCKETS:
            raise ValueError(
                f"bucket_size={bucket_size} yields ~{n_buckets} buckets over "
                f"the order-key range ({span}); the per-bucket offset list is "
                f"collected driver-side and is capped at {_MAX_BUCKETS} rows — "
                "pass a larger bucket_size or None to derive a safe one"
            )
    b = b.withColumn("_bucket", F.expr(f"_ord div {bucket_size}"))
    per_bucket = b.groupBy("_bucket").agg(F.sum(tokens_col).alias("_bsum")).collect()
    offsets: list[tuple[int, int]] = []
    acc = 0
    for row in sorted(per_bucket, key=lambda r: r["_bucket"]):
        offsets.append((row["_bucket"], acc))
        acc += row["_bsum"] or 0
    off_df = docs.sparkSession.createDataFrame(
        offsets, "_bucket long, _off long"
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(off_df), "_bucket")
        .withColumn(
            "cum_before",
            (F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) + F.col("_off")).cast(
                "bigint"
            ),
        )
        .withColumn("shard_id", F.expr(f"cum_before div {budget}"))
        .select(id_col, tokens_col, "cum_before", "shard_id")
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): sliding token-window
    chunking — the step BEFORE ``pack_shards`` when documents exceed the
    training context length.

    Windows start every ``max_tokens - overlap`` tokens (so consecutive
    chunks share ``overlap`` tokens of context, the standard
    long-document training prep); every token appears in at least one
    chunk, the trailing chunk may be shorter than ``max_tokens``, and
    windowing STOPS once a chunk reaches the document end — a further
    window would be fully contained in the previous chunk and duplicate
    its text into the training set (the start bound below is
    ``size - overlap - 1``: any later start is within ``overlap`` of a
    chunk that already covered the tail).  Deterministic: chunk
    boundaries are a pure function of the token count, so replays and
    engine ports agree exactly.

    Scale shape: one narrow projection + posexplode — no shuffle, no
    driver state; a 100 TB corpus chunks in a single map pass.  Feed the
    result's (composite id, n_tokens) into ``pack_shards`` to get
    context-length-bounded, budget-packed shards.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap={overlap} must be smaller than max_tokens={max_tokens}"
            " (the window would never advance)"
        )
    stride = max_tokens - overlap
    chunks = F.expr(
        f"transform(sequence(0, greatest(0,"
        f" size(split({text_col}, ' ')) - 1 - {overlap}), {stride}),"
        f" s -> slice(split({text_col}, ' '), s + 1, {max_tokens}))"
    )
    return (
        docs.select(id_col, F.posexplode(chunks).alias("chunk_idx", "_ctoks"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join("_ctoks", " ").alias("chunk_text"),
            F.size("_ctoks").cast("bigint").alias("n_tokens"),
        )
    )


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic source-weighted training mixture: source ``i`` with
    weight ``w`` contributes each of its documents ``floor(w)`` times,
    plus one more copy for the deterministic ``frac(w)`` fraction of its
    documents (selected by an md5 bucket of (salt, source, id) — no RNG
    state, so the mixture is reproducible on any engine, any
    partitioning, any run; change ``salt`` to redraw the fractional
    subset).  Weights above 1 express multi-epoch upsampling, weights
    below 1 downsampling — the standard mixture-weights step before
    shard packing.

    Output: every input column plus ``source_id`` (index into
    ``sources``) and ``copy`` (0-based repeat index) — feed the result
    into ``pack_shards(..., shuffle_salt=...)`` so copies of a document
    land in different shards.  All sources must share one schema.

    Scale shape: per-source narrow projections (a bucket filter and a
    bounded explode) + a union — no shuffle, no driver state.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one (DataFrame, weight)")
    mixed = None
    for i, (df, weight) in enumerate(sources):
        if weight <= 0:
            raise ValueError(f"source {i}: weight must be positive, got {weight}")
        full = int(weight)
        frac_bp = round((weight - full) * 10_000)  # basis points
        bucket = F.expr(
            "pmod(cast(conv(substr(md5(concat("
            f"'{salt}', '|', '{i}', '|', cast({id_col} as string))), 1, 15),"
            " 16, 10) as bigint), 10000)"
        )
        n_copies = F.lit(full) + F.when(bucket < frac_bp, 1).otherwise(0)
        part = (
            df.withColumn("_n_copies", n_copies)
            .filter(F.col("_n_copies") > 0)
            .withColumn(
                "copy", F.explode(F.expr("sequence(0, _n_copies - 1)"))
            )
            .drop("_n_copies")
            .withColumn("source_id", F.lit(i))
        )
        mixed = part if mixed is None else mixed.unionByName(part)
    return mixed


def temperature_weights(
    sizes: dict[str, int] | dict[int, int], alpha: float = 0.7
) -> dict:
    """Temperature-scaled mixture weights from per-source corpus sizes —
    the standard multilingual/multi-source rebalance (sample source i
    with probability proportional to ``n_i^alpha``; alpha=1 keeps the
    natural distribution, alpha->0 approaches uniform; mT5/XLM-R use
    ~0.3-0.7).

    Returns per-source weight MULTIPLIERS for ``mix_corpora``: source i
    should contribute ``N * p_i`` documents where ``p_i = n_i^alpha /
    sum_j n_j^alpha`` and ``N = sum_j n_j`` is the total corpus size, so
    ``w_i = N * p_i / n_i``.  Small sources get w > 1 (upsampled, which
    ``mix_corpora`` expresses as extra epochs), large sources w < 1.
    Driver-side pure arithmetic on the (tiny) per-source count dict —
    derive the counts with one groupBy.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    if not sizes or any(n <= 0 for n in sizes.values()):
        raise ValueError("sizes must be a non-empty dict of positive counts")
    total = sum(sizes.values())
    scaled = {k: float(n) ** alpha for k, n in sizes.items()}
    denom = sum(scaled.values())
    return {k: (total * (scaled[k] / denom)) / sizes[k] for k in sizes}


def write_shards(
    packed: DataFrame,
    out_dir: str,
    format: str = "parquet",
) -> DataFrame:
    """Materialize a packed corpus as one file per shard under
    ``out_dir/shard_id=N/`` — the final step after ``pack_shards``:
    training jobs read whole shard directories sequentially.

    ``repartition("shard_id")`` co-locates each shard in one task, so
    ``partitionBy`` emits exactly one file per shard (no small-file
    spray), and because shard assignment is deterministic the same
    corpus + budget + salt always writes byte-identical shard contents.
    Returns the (shard_id, n_docs, n_tokens) manifest — computed from
    the SAME frame, one aggregate — which callers persist beside the
    data as the shard inventory."""
    packed = packed.localCheckpoint(eager=True)
    tokens_col = "n_tokens" if "n_tokens" in packed.columns else None
    aggs = [F.count("*").alias("n_docs")]
    if tokens_col:
        aggs.append(F.sum(tokens_col).cast("bigint").alias("n_tokens"))
    manifest = packed.groupBy("shard_id").agg(*aggs).orderBy("shard_id")
    (
        packed.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(format)
        .save(out_dir)
    )
    return manifest
