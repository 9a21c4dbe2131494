"""Distributed n-gram language model + perplexity scoring — the CCNet
corpus-quality signal (Wenzek et al. 2020: filter/ bucket CommonCrawl by
the perplexity of a LM trained on a trusted corpus).

The model is Stupid Backoff (Brants et al. 2007, "Large Language Models
in Machine Translation") — the backoff scheme DESIGNED for distributed
counting: no discount mass bookkeeping, just raw n-gram counts and a
fixed backoff multiplier, so training is three map-side-combined
``groupBy``s and scoring is keyed equi-joins.  Per position::

    S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)          if the trigram was seen
                  = 0.4 * c(w2w3) / c(w2)        elif the bigram was seen
                  = 0.4^2 * (c(w3)+1) / (N+V)    else (add-one unigram
                                                 floor, handles OOV)

Cross-engine determinism (the repo's bit-stable contract — see
operators/classifier.py's "no exp" stance): log10 is transcendental and
its last ulp differs between Java's Math and DuckDB's libm, so the score
is NEVER computed as a float log of a float ratio.  Instead every count
is quantized ONCE to integer micro-log units::

    Q(c) = cast(round(log10(c) * 10000) as bigint)

log10 is evaluated only at positive-integer points, where a 1-ulp
disagreement flips the rounded value only if log10(n) lies within ~1e-15
of a 0.0001 grid line — measure-zero over the few thousand distinct
count values any corpus produces.  All backoff arithmetic is then exact
integer math (the 0.4 multiplier IS the integer constant
``BACKOFF_Q = round(log10(0.4)*10000) = -3979``), sums commute under any
partitioning, and the only float ops left are one division of two exact
integers (IEEE-identical in every engine) and the final round(,6).

Scale shape (100 TB): n-grams are carried as 60-bit md5 hashes
(minhash.H60 — 8-byte join keys, never the strings); counts are
map-side-combined groupBys; scoring scores each DISTINCT trigram once
(joins between aggregated count tables, linear in distinct n-grams) and
then joins positions — pre-aggregated to (doc, trigram, n) — against the
scored table on the hash key.  N and V are a 1-row aggregate broadcast
via crossJoin.  No fan-out, no window over the corpus, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.minhash import H60

#: round(log10(0.4) * 10000): the Stupid-Backoff multiplier in integer
#: micro-log units — a defined constant of the operator, not a runtime
#: float (keeps the score integral and engine-portable).
BACKOFF_Q = -3979

#: micro-log of a positive integer count expression (see module
#: docstring for why this is the ONLY transcendental evaluation).
_Q = "cast(round(log10(cast({c} as double)) * 10000) as bigint)"


def _tok_arrays(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, _toks): the split token array, projected SEPARATELY so
    downstream in-row n-gram expressions evaluate ``split`` once per
    document (the Project stays below the Generate)."""
    return docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_toks")
    )


#: in-row n-gram hash array over ``_toks`` (1-based element_at windows;
#: {n} = gram order, {h} = the hash expression over the joined window).
_GRAMS_ARR = (
    "CASE WHEN size(_toks) >= {n} THEN "
    "transform(sequence(0, size(_toks) - {n}), i -> {h}) "
    "ELSE array() END"
)


def _w(k: int) -> str:
    """The k-th token of the window starting at lambda index i."""
    return f"element_at(_toks, i + {k})"


def _keyed_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, t_h, b12_h, b23_h, u2_h, u3_h): one row per trigram
    position, carrying the five 60-bit hash keys its score depends on —
    trigram (w1 w2 w3), context bigram (w1 w2), backoff bigram (w2 w3),
    unigrams w2 / w3.  Built in-row (transform over the token array +
    explode): zero shuffle — the former explode + window-lead shape
    paid a corpus-token Exchange + Sort per materialization (r11
    measurement: 6 Window nodes in the tx_lang_id plan, one per
    aggregation over the un-cached gram frame)."""
    h = lambda x: H60.format(x=x)  # noqa: E731
    w1, w2, w3 = _w(1), _w(2), _w(3)
    expr = _GRAMS_ARR.format(
        n=3,
        h=(
            "named_struct("
            f"'t_h', {h(f_concat(w1, w2, w3))}, "
            f"'b12_h', {h(f_concat(w1, w2))}, "
            f"'b23_h', {h(f_concat(w2, w3))}, "
            f"'u2_h', {h(w2)}, "
            f"'u3_h', {h(w3)})"
        ),
    )
    return _tok_arrays(docs, text_col).select(
        "doc_id", F.explode(F.expr(expr)).alias("_g")
    ).select("doc_id", "_g.*")


def f_concat(*parts: str) -> str:
    """space-joined concat of token expressions (the n-gram string)."""
    return "concat(" + ", ' ', ".join(parts) + ")"


@dataclass
class NgramLM:
    """Trained count tables, all hash-keyed: ``tri``/``bi``/``uni`` =
    (h, c) counts; ``totals`` = one row (n_tokens, n_vocab).  Persist the
    four frames (TableStore, bucketed by h) to score later increments
    without re-counting the training corpus."""

    tri: DataFrame
    bi: DataFrame
    uni: DataFrame
    totals: DataFrame


def train_ngram_lm(docs: DataFrame, text_col: str = "text") -> NgramLM:
    """Count unigrams/bigrams/trigrams of the training corpus.

    Each n-gram level is an in-row hash-array transform + explode (zero
    shuffle before the aggregation — no token window; see _keyed_rows)
    feeding a map-side-combined groupBy on an 8-byte hash key.  Counts
    are corpus-additive, so an increment's counts merge into a persisted
    LM by summing on the key (the same insert-or-add idiom as the
    incremental dedup indexes).  ``totals`` derives from the unigram
    counts (n_tokens = Σc, n_vocab = row count) — the former dedicated
    corpus pass with its countDistinct shuffle is gone."""
    h = lambda x: H60.format(x=x)  # noqa: E731
    toks = _tok_arrays(docs, text_col)

    def _level(n: int, gram_h: str) -> DataFrame:
        arr = _GRAMS_ARR.format(n=n, h=gram_h)
        return (
            toks.select(F.explode(F.expr(arr)).alias("h"))
            .groupBy("h")
            .agg(F.count("*").alias("c"))
        )

    uni = _level(1, h(_w(1)))
    bi = _level(2, h(f_concat(_w(1), _w(2))))
    tri = _level(3, h(f_concat(_w(1), _w(2), _w(3))))
    totals = uni.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_vocab"),
    )
    return NgramLM(tri=tri, bi=bi, uni=uni, totals=totals)


def score_trigrams(trigram_keys: DataFrame, lm: NgramLM) -> DataFrame:
    """Score each distinct trigram of a target corpus against the LM.

    ``trigram_keys``: distinct (t_h, b12_h, b23_h, u2_h, u3_h) rows (from
    ``_keyed_rows``).  Returns the same keys + ``q`` — the position log10-score
    in integer micro-log units.  This is the per-DISTINCT-trigram pass: a
    trigram shared by millions of documents is scored once, and every
    join here is between aggregated tables on 8-byte keys."""
    q = lambda c: F.expr(_Q.format(c=c))  # noqa: E731
    scored = (
        trigram_keys.join(
            lm.tri.select(F.col("h").alias("t_h"), F.col("c").alias("c123")),
            "t_h",
            "left",
        )
        .join(
            lm.bi.select(F.col("h").alias("b12_h"), F.col("c").alias("c12")),
            "b12_h",
            "left",
        )
        .join(
            lm.bi.select(F.col("h").alias("b23_h"), F.col("c").alias("c23")),
            "b23_h",
            "left",
        )
        .join(
            lm.uni.select(F.col("h").alias("u2_h"), F.col("c").alias("c2")),
            "u2_h",
            "left",
        )
        .join(
            lm.uni.select(F.col("h").alias("u3_h"), F.col("c").alias("c3")),
            "u3_h",
            "left",
        )
        .crossJoin(F.broadcast(lm.totals))
    )
    # a trigram seen in training implies its prefix bigram was counted;
    # a bigram (w2 w3) seen implies unigram w2 was — the CASE arms never
    # touch a NULL denominator.
    return scored.select(
        "t_h",
        "b12_h",
        "b23_h",
        "u2_h",
        "u3_h",
        F.when(F.col("c123").isNotNull(), q("c123") - q("c12"))
        .when(F.col("c23").isNotNull(), F.lit(BACKOFF_Q) + q("c23") - q("c2"))
        .otherwise(
            F.lit(2 * BACKOFF_Q)
            + q("coalesce(c3, 0L) + 1")
            - q("n_tokens + n_vocab")
        )
        .alias("q"),
    )


def perplexity(
    docs: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    cuts: tuple[float, float] = (-1.0, -1.5),
) -> DataFrame:
    """Per-document LM score: (doc_id, n_scored, avg_logprob, ppl_bucket).

    ``avg_logprob`` = mean log10 Stupid-Backoff score over the document's
    trigram positions, rounded to 6 places (documents with fewer than 3
    tokens score NULL, n_scored = 0).  ``ppl_bucket`` is the CCNet-style
    head/middle/tail split: head when avg_logprob >= cuts[0], middle when
    >= cuts[1], else tail (CCNet cuts at per-language percentiles; fixed
    cuts keep the operator deterministic — compute corpus percentiles
    separately if adaptive cuts are wanted).

    Plan: positions pre-aggregate to (doc, trigram, n) before the scored
    join, so the join input is distinct trigrams per doc, and the final
    aggregate sums exact integers (partitioning-independent).

    The mean is NOT round(sum/(1e4*n), 6): with ~1e6 denominators that
    rational lands near a 1e-6 decimal midpoint often enough that Spark's
    BigDecimal HALF_UP and DuckDB's scaled-multiply round disagree
    (observed at sf0.01).  Instead ``floor(sum_q*100/n)`` — double math
    over exact-in-double integers, correctly rounded identically
    everywhere, floored (no midpoint) — gives integer micro-log units,
    and ``avg_logprob`` is that integer / 1e6."""
    keyed = _keyed_rows(docs, text_col)
    per_doc_tri = keyed.groupBy(
        "doc_id", "t_h", "b12_h", "b23_h", "u2_h", "u3_h"
    ).agg(F.count("*").alias("n"))
    scored = score_trigrams(
        per_doc_tri.select("t_h", "b12_h", "b23_h", "u2_h", "u3_h").distinct(),
        lm,
    )
    agg = (
        per_doc_tri.join(scored, ["t_h", "b12_h", "b23_h", "u2_h", "u3_h"])
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_scored"),
            F.sum(F.col("q") * F.col("n")).alias("sum_q"),
        )
    )
    avg = (
        F.floor(F.col("sum_q").cast("double") * 100.0 / F.col("n_scored"))
        / 1000000.0
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("bigint").alias(
                "n_scored"
            ),
            avg.alias("avg_logprob"),
            F.when(F.col("n_scored").isNull(), F.lit(None).cast("string"))
            .when(avg >= cuts[0], F.lit("head"))
            .when(avg >= cuts[1], F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )
