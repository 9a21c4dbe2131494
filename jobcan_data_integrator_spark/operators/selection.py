"""DSIR-style data selection — importance resampling on hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS).

A 100 TB training pipeline rarely wants *all* of a raw crawl; it wants
the slice that looks like a trusted target domain.  DSIR formalizes the
slice: fit two bag-of-hashed-n-grams models — one on the target corpus,
one on the raw corpus — and weight every raw document by its log
likelihood ratio

    log w(d) = sum_b  f_d(b) * ( log p_target(b) - log p_raw(b) )

where ``b`` ranges over N_BUCKETS hash buckets of the document's
unigrams+bigrams and ``f_d(b)`` is the bucket count.  Selection keeps
the top-k by weight (the deterministic analog of the paper's Gumbel
top-k resampling — a hash tiebreak replaces the noise term, so reruns
and engines agree bit-for-bit).

Cross-engine determinism (the repo's bit-stable contract — see
operators/lm.py): bucket probabilities are add-one smoothed, so every
log10 is evaluated ONLY at positive-integer points and quantized once
to integer micro-log units ``Q(c) = cast(round(log10(c)*10000) as
bigint)``.  The per-document weight is then an exact BIGINT sum of
integer products — partitioning-independent, and DuckDB replays it
bit-for-bit (tests/test_selection.py, gate ``tx_stratified_sample``).

Scale shape (100 TB): features are one in-row n-gram build + explode +
a map-side-combined ``groupBy(doc_id, bucket)``; the fit is ONE
conditional aggregation of that frame (target and raw counted
together), the fitted model is a <= N_BUCKETS-row delta table (fits in
a broadcast at any corpus size), and scoring is one BROADCAST join +
one per-doc aggregate — the corpus is never shuffled on anything wider
than its own doc key.  Top-k selection
is a sort-limit (Spark's TakeOrdered: per-partition partial top-k, no
global sort shuffle) and the k selected ids come back as a broadcast
semi-join.  Bucket tables are corpus-additive counts, so a persisted
model absorbs increments by key-summing and scores new documents
without re-reading the corpus (same increments-not-snapshots stance as
operators/incremental.py; reference analog: the incremental outline
fetch, /root/reference/jobcan_di/gateway/api_client.py:521-597).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.minhash import H60

#: Default hashed-feature dimensionality (the paper uses 10k buckets).
N_BUCKETS = 10_000

#: Micro-log10 of a positive-integer count expression (see operators/
#: lm.py for why this is the only transcendental evaluation allowed).
_Q = "cast(round(log10(cast({c} as double)) * 10000) as bigint)"


def hashed_ngram_features(
    docs: DataFrame, text_col: str = "text", n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, bucket, f): hashed unigram+bigram bag-of-words counts.

    The n-grams are built IN-ROW (``zip_with`` over the token array, the
    same shape as tx_corpus_filter's bigram fold — no doc-keyed window
    shuffle), exploded once, and bucketed by the portable 60-bit md5
    hash mod ``n_buckets``.  The groupBy is map-side combined and its
    key is (doc_id, int) — 12 bytes."""
    grams = (
        "concat(toks, filter(zip_with(toks, slice(toks, 2, size(toks)),"
        " (a, b) -> concat(a, ' ', b)), x -> x is not null))"
    )
    bucket = F.expr(f"pmod({H60.format(x='g')}, {n_buckets})").cast("int")
    return (
        docs.select(
            "doc_id", F.split(F.col(text_col), " ").alias("toks")
        )
        .select("doc_id", F.explode(F.expr(grams)).alias("g"))
        .groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("f"))
    )


def _check_feats(feats: DataFrame) -> DataFrame:
    """Guard for the precomputed-``feats`` override (fit_dsir /
    dsir_weights): the frame must be a ``hashed_ngram_features`` result —
    callers passing one built with a different ``n_buckets`` than the
    model would get silently inconsistent bucketing, so at least the
    shape contract is asserted (ADVICE r11)."""
    if set(feats.columns) != {"doc_id", "bucket", "f"}:
        raise ValueError(
            "feats must be a hashed_ngram_features frame with columns "
            f"{{doc_id, bucket, f}}; got {feats.columns} — and it must "
            "have been built with the same n_buckets as the model"
        )
    return feats


@dataclass
class DsirModel:
    """Fitted model, tiny: ``delta_q`` = (bucket, dq) — the per-bucket
    weight ``q_target(b) - q_raw(b)`` in integer micro-log10 units, one
    row per bucket seen in the raw corpus (target buckets are a subset
    by construction); ``floor_dq`` = one row — the delta of a bucket
    unseen in BOTH models, coalesced in at score time.  Persist the two
    frames via TableStore to score later increments without re-counting
    the fit corpus."""

    delta_q: DataFrame
    floor_dq: DataFrame


def fit_dsir(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    feats: DataFrame | None = None,
) -> DsirModel:
    """Fit the target-vs-raw bucket model in ONE corpus aggregation.

    ``is_target`` marks the trusted-domain rows (e.g. ``col("lang") ==
    "en"`` or a curated-source flag); the raw model counts ALL rows,
    per the paper (raw = the distribution selected from).  Both counts
    come out of a single conditional groupBy over the feature frame —
    the corpus is read once — and everything downstream (smoothed
    micro-log probabilities, the delta table, the floor) is arithmetic
    over the <= n_buckets-row count frame:

        dq(b) = [Q(c_t(b)+1) - Q(T_t+B)] - [Q(c_r(b)+1) - Q(T_r+B)]

    with Q = round(log10(.)*10000) evaluated only at integer points, so
    the whole model is exact-integer and engine-portable.

    ``feats``: optionally a precomputed ``hashed_ngram_features(docs)``
    frame — a caller that also scores the same corpus
    (``dsir_weights``) passes one cached frame so the feature pass (the
    dominant corpus-wide aggregation of the DSIR pipeline) runs once,
    not twice.  Same rows either way."""
    if feats is None:
        feats = hashed_ngram_features(docs, text_col, n_buckets)
    else:
        feats = _check_feats(feats)
    feats = feats.join(
        docs.select("doc_id", is_target.alias("_is_target")), "doc_id"
    )
    counts = feats.groupBy("bucket").agg(
        F.sum("f").alias("c_r"),
        F.sum(
            F.when(F.col("_is_target"), F.col("f")).otherwise(F.lit(0))
        ).alias("c_t"),
    )
    tot = counts.agg(
        F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t")
    ).select(
        F.expr(_Q.format(c=f"t_t + {n_buckets}")).alias("den_t"),
        F.expr(_Q.format(c=f"t_r + {n_buckets}")).alias("den_r"),
    )
    q_t = F.expr(_Q.format(c="c_t + 1"))
    q_r = F.expr(_Q.format(c="c_r + 1"))
    delta = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (q_t - F.col("den_t") - q_r + F.col("den_r")).alias("dq"),
    )
    floor = tot.select((F.col("den_r") - F.col("den_t")).alias("floor_dq"))
    return DsirModel(delta_q=delta, floor_dq=floor)


def dsir_weights(
    docs: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, logratio_q): the DSIR importance weight of every
    document in integer micro-log10 units (sum of exact integers —
    bit-stable under any partitioning).

    The delta table is <= n_buckets rows → ONE broadcast join; the only
    corpus-wide exchange is the per-doc feature groupBy.  Works
    unchanged on an increment: unseen buckets coalesce to the floor.
    ``feats``: optionally the precomputed feature frame (see
    ``fit_dsir``)."""
    if feats is None:
        feats = hashed_ngram_features(docs, text_col, n_buckets)
    else:
        feats = _check_feats(feats)
    scored = (
        feats.join(F.broadcast(model.delta_q), "bucket", "left")
        .crossJoin(F.broadcast(model.floor_dq))
        .select(
            "doc_id",
            (
                F.col("f") * F.coalesce(F.col("dq"), F.col("floor_dq"))
            ).alias("wq"),
        )
    )
    return (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(F.sum("wq").alias("logratio_q")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("logratio_q"), F.lit(0))
            .cast("bigint")
            .alias("logratio_q"),
        )
    )


def dsir_select(weighted: DataFrame, k: int) -> DataFrame:
    """The k selected doc_ids: top-k by (logratio_q DESC, doc_id ASC).

    The ascending-id tiebreak is the deterministic stand-in for the
    paper's Gumbel noise — every engine and every rerun picks the same
    set.  ``orderBy().limit()`` compiles to TakeOrderedAndProject
    (per-partition partial top-k merged on the driver, k rows — no
    global sort shuffle), and the result is small enough to broadcast
    back against the corpus."""
    return (
        weighted.orderBy(F.col("logratio_q").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id")
    )


def sample_per_cluster(
    df: DataFrame,
    k: int,
    cluster_col: str = "cluster",
    id_col: str = "doc_id",
    salt: str = "cluster-sample",
) -> DataFrame:
    """Deterministic cluster-balanced sampling: keep at most ``k`` rows
    per cluster, chosen by md5(salt | id) rank — the topic-balancing
    step after k-means / SemDeDup cell assignment (uniform sampling
    over a skewed cluster distribution reproduces the skew; per-cluster
    caps flatten it).

    No RNG state: the same (corpus, salt, k) selects the same rows on
    any engine or partitioning, and changing the salt re-draws — the
    same md5-bucket stance as the stratified sampler (gate/llm.py) and
    the packer's shuffled order.  One hash shuffle on the cluster key;
    the window is rank-only (no full sort materialization beyond the
    per-cluster ordering any top-k needs)."""
    from pyspark.sql.window import Window

    order = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(cluster_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
