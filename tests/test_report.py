"""Corpus profiling report (operators/report.py) — DuckDB value oracle."""

from __future__ import annotations

import duckdb

from jobcan_data_integrator_spark.operators.report import corpus_report
from jobcan_data_integrator_spark.session import load_table

_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks
  FROM read_parquet('{path}')
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
         CAST(min(len(toks)) AS BIGINT) AS min_doc_tokens,
         CAST(max(len(toks)) AS BIGINT) AS max_doc_tokens,
         round(avg(len(toks)), 6) AS avg_doc_tokens
  FROM t
), vocab AS (
  SELECT CAST(count(DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT)
              AS BIGINT) AS vocab_size
  FROM (SELECT unnest(toks) AS tok FROM t)
)
SELECT n_docs, n_tokens, n_chars, distinct_texts,
       n_docs - distinct_texts AS dup_docs,
       min_doc_tokens, max_doc_tokens, avg_doc_tokens, vocab_size
FROM base, vocab
"""


def test_report_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = corpus_report(docs).collect()[0].asDict()
    want = (
        duckdb.sql(_ORACLE.format(path=f"{sf_dir}/documents.parquet"))
        .df()
        .iloc[0]
        .to_dict()
    )
    assert {k: float(v) for k, v in got.items()} == {
        k: float(v) for k, v in want.items()
    }


def test_report_reflects_curation(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    r = corpus_report(docs).collect()[0]
    assert (r.n_docs, r.distinct_texts, r.dup_docs) == (3, 2, 1)
    assert (r.n_tokens, r.vocab_size) == (8, 5)
    assert (r.min_doc_tokens, r.max_doc_tokens) == (2, 3)
