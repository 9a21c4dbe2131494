"""DSIR importance resampling (operators/selection.py) — DuckDB value
oracle for the integer micro-log weights + behavioral checks."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.selection import (
    dsir_select,
    dsir_weights,
    fit_dsir,
)
from jobcan_data_integrator_spark.session import load_table

_B = 1000  # smaller bucket space so the smoke corpus collides a bit

# Replays fit_dsir + dsir_weights bit-for-bit: hashed unigram+bigram
# buckets, add-one-smoothed micro-log10 bucket probabilities (log10 only
# at integer points), exact integer weight sums.
_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks
  FROM read_parquet('{{path}}')
), grams AS (
  SELECT doc_id, unnest(toks) AS g FROM t
  UNION ALL
  SELECT doc_id,
         unnest(list_filter(
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1]),
           x -> x IS NOT NULL)) AS g
  FROM t
), feats AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 15))::BIGINT % {_B} AS INT)
           AS bucket,
         CAST(count(*) AS BIGINT) AS f
  FROM grams GROUP BY 1, 2
), tgt AS (
  SELECT bucket, sum(f) AS c
  FROM feats JOIN t USING (doc_id) WHERE t.lang = 'en' GROUP BY 1
), raw AS (
  SELECT bucket, sum(f) AS c FROM feats GROUP BY 1
), tden AS (
  SELECT CAST(round(log10(CAST(sum(c) + {_B} AS DOUBLE)) * 10000)
              AS BIGINT) AS dq
  FROM tgt
), rden AS (
  SELECT CAST(round(log10(CAST(sum(c) + {_B} AS DOUBLE)) * 10000)
              AS BIGINT) AS dq
  FROM raw
), tq AS (
  SELECT bucket,
         CAST(round(log10(CAST(c + 1 AS DOUBLE)) * 10000) AS BIGINT)
           - tden.dq AS q
  FROM tgt CROSS JOIN tden
), rq AS (
  SELECT bucket,
         CAST(round(log10(CAST(c + 1 AS DOUBLE)) * 10000) AS BIGINT)
           - rden.dq AS q
  FROM raw CROSS JOIN rden
)
SELECT f.doc_id,
       CAST(sum(f.f * (coalesce(tq.q, -tden.dq) - coalesce(rq.q, -rden.dq)))
            AS BIGINT) AS logratio_q
FROM feats f
LEFT JOIN tq USING (bucket)
LEFT JOIN rq USING (bucket)
CROSS JOIN tden CROSS JOIN rden
GROUP BY f.doc_id
ORDER BY f.doc_id
"""


def _weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = fit_dsir(docs, F.col("lang") == "en", n_buckets=_B)
    return docs, dsir_weights(docs, model, n_buckets=_B)


def test_dsir_weights_match_duckdb(spark, sf_dir):
    _, w = _weights(spark, sf_dir)
    got = [(r.doc_id, r.logratio_q) for r in w.orderBy("doc_id").collect()]
    want = duckdb.sql(
        _ORACLE.format(path=f"{sf_dir}/documents.parquet")
    ).fetchall()
    assert got == [(d, int(q)) for d, q in want]


def test_dsir_prefers_target_like_documents(spark, sf_dir):
    docs, w = _weights(spark, sf_dir)
    by_lang = (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("logratio_q").alias("m"))
        .collect()
    )
    means = {r[0]: r.m for r in by_lang}
    # English documents must score higher on average than non-English —
    # the selection signal the likelihood ratio exists to produce.
    assert means[True] > means[False]


def test_dsir_select_topk_deterministic(spark, sf_dir):
    _, w = _weights(spark, sf_dir)
    k = 25
    sel = sorted(r.doc_id for r in dsir_select(w, k).collect())
    assert len(sel) == k
    # replay: top-k by (weight desc, doc_id asc) on the collected frame
    rows = sorted(
        ((r.logratio_q, r.doc_id) for r in w.collect()),
        key=lambda x: (-x[0], x[1]),
    )
    assert sel == sorted(d for _, d in rows[:k])


def test_dsir_scores_unseen_increment(spark):
    base = spark.createDataFrame(
        [
            (0, "the cat sat on the mat", "en"),
            (1, "the dog ran in the park", "en"),
            (2, "der hund lief im park", "de"),
            (3, "die katze sass auf der matte", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    model = fit_dsir(base, F.col("lang") == "en", n_buckets=_B)
    inc = spark.createDataFrame(
        [(10, "the cat ran on the mat"), (11, "der hund lief auf der matte")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.logratio_q
        for r in dsir_weights(inc, model, n_buckets=_B).collect()
    }
    # an English-like increment doc outranks a German-like one whose
    # grams were seen only in the raw model (target count 0 -> strongly
    # negative per-bucket ratios); neither doc was in the fit corpus
    assert got[10] > got[11]
